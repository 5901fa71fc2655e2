"""Driver-contract implementation: queries() + oracle_sql() pairs.

Every implemented operator from SURVEY.md §2 gets a named query (a
callable running the real Ray Data pipeline) and, where SQL-expressible,
a DuckDB oracle over *independent* tables:

* raster/zonal/kNN/dedup queries run over the seeded synthetic tile
  corpus (fixture 't2', BASELINE.json input_hint schema — the brief says
  to synthesize the input table deterministically); their oracles read
  the generator's ``pixels`` / ``pixel_zones`` / ``plots`` parquet — the
  values *before* encoding and memberships from independent geometry
  logic — via ``read_parquet`` on absolute paths;
* document / embedding / event / relational queries run over the
  driver's ``sf_dir`` tables and their oracles use the pre-registered
  views.

Float discipline: continuous results are exported as scaled integers
(``*_u`` = micro-units, floor(x·1e6 + 0.5)) computed with float64 on
both sides, so the driver's value-hash comparison is exact. Money sums
convert per row to integer cents *before* summing — bit-exact regardless
of summation order.
"""

from gridfia_ray.contract._shared import *  # noqa: F401,F403
from gridfia_ray.contract.gf_focal import *  # noqa: F401,F403
from gridfia_ray.contract.gf_terrain import *  # noqa: F401,F403
from gridfia_ray.contract.gf_zonal import *  # noqa: F401,F403
from gridfia_ray.contract.gf_store import *  # noqa: F401,F403
from gridfia_ray.contract.mm import *  # noqa: F401,F403
from gridfia_ray.contract.docs import *  # noqa: F401,F403
from gridfia_ray.contract.emb import *  # noqa: F401,F403
from gridfia_ray.contract.rel import *  # noqa: F401,F403
from gridfia_ray.contract.events import *  # noqa: F401,F403
from gridfia_ray.contract.graph import *  # noqa: F401,F403
from gridfia_ray.contract._registry import build_oracle_sql, build_queries
