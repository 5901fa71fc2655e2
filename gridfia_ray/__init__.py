"""gridfia_ray — a Ray-Data-native spatial tiling / zonal-statistics engine.

A from-scratch rebuild of the query and data-processing capabilities of the
GridFIA reference (per-species biomass raster analytics, zonal statistics
over polygons, species-diversity map algebra) re-expressed as
``ray.data.Dataset`` pipelines over a *table of tiles*:

    tiles(image_id: string, bytes: binary, w: int32, h: int32,
          fmt: string, caption: string(JSON), phash: int64)

Design (see SURVEY.md):
  * every stage is a ``map_batches`` over zero-copy Arrow batches;
  * stateful stages (codec handles, prepared polygon indexes) are actor
    pools (callable classes, ``concurrency=N``);
  * species-stack assembly, zonal aggregation and dedup are keyed
    shuffles on a Z-order ``cell_id`` with explicit bucketing/salting;
  * nothing materializes the full dataset on the driver.
"""

__version__ = "0.1.0"

from gridfia_ray.context import tune_context  # noqa: F401
