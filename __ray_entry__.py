"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship spatial-join + tiling pipeline at sf0.001;
``queries()`` exposes each implemented operator/pipeline (SURVEY.md §2)
as ``name -> callable(sf_dir)``; ``oracle_sql()`` gives the DuckDB
equivalent for the SQL-expressible ones.

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in texel_ray) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

# The synthetic images/regions tables (deterministic, seeded — see
# texel_ray/sources/) are materialized once under /tmp so both the Ray
# pipelines and the DuckDB oracle SQL read the same parquet files.
from texel_ray.sources.images import ensure_images_for_sf_dir
from texel_ray.sources.regions import regions_parquet_path

ensure_images_for_sf_dir("/root/testdata/sf0.001")
ensure_images_for_sf_dir("/root/testdata/sf0.01")
regions_parquet_path()


def entry() -> Any:
    """Flagship pipeline on sf0.001: PIP join + per-tile counts."""
    from texel_ray.pipelines.flagship import tile_counts

    return tile_counts("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from texel_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from texel_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
