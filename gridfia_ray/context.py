"""Ray Data execution-context tuning shared by pipelines, tests and bench.

Never calls ``ray.init`` / ``ray.shutdown`` — session ownership belongs to
the caller (driver, bench.py, or the pytest fixture).
"""

from __future__ import annotations


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
        import logging

        ctx.enable_progress_bars = False
        try:
            ctx.execution_options.verbose_progress = False
        except AttributeError:
            pass
        logging.getLogger("ray.data").setLevel(logging.WARNING)
