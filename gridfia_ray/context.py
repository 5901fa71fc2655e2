"""Ray Data execution-context tuning shared by pipelines, tests and bench.

Never calls ``ray.init`` / ``ray.shutdown`` — session ownership belongs to
the caller (driver, bench.py, or the pytest fixture).
"""

from __future__ import annotations

import logging


def tune_context(
    target_max_block_size: int = 256 * 1024 * 1024,
    preserve_order: bool = False,
    quiet: bool = True,
) -> None:
    """Apply scale-appropriate Ray Data context knobs.

    * ``target_max_block_size`` default 256 MiB — tile rows are wide
      (binary pixel payloads); the target must EXCEED one ingest file's
      decoded size, because dynamic block splitting slices the shared
      binary buffer and every slice re-serializes the parent (measured
      2x write amplification per extra split).
    * ``preserve_order=False`` — every operator here is key-addressed
      (cell_id / zone_id / species_code); order is meaningless and
      preserving it costs pipelining.
    """
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.target_max_block_size = target_max_block_size
    ctx.execution_options.preserve_order = preserve_order
    if quiet:
        ctx.enable_progress_bars = False
        try:
            ctx.execution_options.verbose_progress = False
        except AttributeError:
            pass
        logging.getLogger("ray.data").setLevel(logging.WARNING)
        _filter_empty_block_schema_warnings()


class _EmptyBlockSchemaFilter(logging.Filter):
    """Drops ONLY the executor's schema-churn warning for EMPTY blocks.

    Ray's sort/shuffle generates zero-row padding blocks for empty
    partitions without consulting the UDF, and those blocks carry no
    schema (``PandasBlockSchema(names=[])`` / an empty Arrow schema), so
    the "produced a RefBundle with a different schema" warning fires on
    every bucketed merge whose bucket count exceeds the occupied
    partitions — pure noise that no user code can prevent. Genuine
    schema churn (two NON-empty schemas differing) still logs."""

    def filter(self, record) -> bool:  # logging.Filter protocol
        msg = record.getMessage()
        if "different schema than the previous one" not in msg:
            return True
        return not (
            "new schema: PandasBlockSchema(names=[], types=[])" in msg
            or "new schema: . " in msg
            or msg.rstrip().endswith("new schema: .")
        )


def _filter_empty_block_schema_warnings() -> None:
    logger = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    )
    if not any(isinstance(f, _EmptyBlockSchemaFilter) for f in logger.filters):
        logger.addFilter(_EmptyBlockSchemaFilter())
