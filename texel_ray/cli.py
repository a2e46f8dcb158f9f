"""CLI driver — the `ray job submit` entry point.

Mirrors the reference CLI's surface (``main.go:39-188``): source table,
per-zoom targets, TMS selection, zoom list, keep-points-and-lines /
ignore-outside-grid / reverse-winding-order flags, overwrite — re-expressed
as Ray Data pipelines with a resumable partitioned sink (the per-zoom
`target_%v.gpkg` files become `out/tm_id=Z/` parquet partitions + lineage
manifest).

Subcommands:
  snap  — snap a polygon table to the tile grid per zoom (the reference's
          only executable path)
  tiles — flagship image pipeline: PIP join + tile assignment, partitioned
          tile write

Usage (local or `ray job submit -- python -m texel_ray.cli ...`):
  python -m texel_ray.cli snap -s regions.parquet -t /tmp/out \
      --tms WebMercatorQuad -z 4,8 --keep-points-and-lines
"""

from __future__ import annotations

import argparse
import shutil
import sys


def _ray_init(num_cpus: int | None):
    import os

    import ray

    if not ray.is_initialized():
        # Under `ray job submit` the runtime sets RAY_ADDRESS to the
        # cluster address — connect to it; standalone runs default to a
        # fresh local session. num_cpus only applies to the local case
        # (a cluster's size is the cluster's).
        address = os.environ.get("RAY_ADDRESS", "local")
        kwargs = {"num_cpus": num_cpus} if address == "local" else {}
        ray.init(
            address=address,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
            **kwargs,
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False


def cmd_snap(args) -> int:
    from .core.tms import builtin_tms
    from .stages.snap_stage import snap_dataset
    from .state.manifest import resumable_write

    tms = builtin_tms(args.tms)
    ok, reason = tms.is_quadtree()
    if not ok:
        print(f"error: TMS {args.tms} is not a quadtree: {reason}", file=sys.stderr)
        return 2
    zooms = tuple(int(z) for z in args.zooms.split(","))
    _, dev_px = tms.deviation_stats(max(zooms))
    if abs(dev_px) >= 1.0:
        print(
            f"warning: fixed-point deviation at deepest zoom is {dev_px:.2f} px (>= 1)",
            file=sys.stderr,
        )

    if args.overwrite:
        shutil.rmtree(args.target, ignore_errors=True)

    _ray_init(args.num_cpus)
    import ray.data

    if args.source.endswith(".gpkg"):
        from .sources.gpkg import list_tables, read_gpkg

        table = args.table or list_tables(args.source)[0].name
        ds = read_gpkg(args.source, table)
    else:
        ds = ray.data.read_parquet(args.source)
    snapped = snap_dataset(
        ds,
        args.tms,
        zooms,
        keep_points_and_lines=args.keep_points_and_lines,
        ignore_outside_grid=args.ignore_outside_grid,
        reverse_winding_order=args.reverse_winding_order,
        geom_col=args.geom_column,
    )
    n_in = ds.count()
    written, skipped = resumable_write(
        snapped,
        args.target,
        partition_col="tm_id",
        inputs=[args.source],
        range_cols=("fid",),
    )
    from .state.manifest import Manifest

    per_zoom = {
        rec["key"]["tm_id"]: rec["rows"] for rec in Manifest(args.target).completed().values()
    }
    print(
        f"snap: {n_in} input features -> rows per zoom {per_zoom} "
        f"(features dropped by collapse/outside-grid are absent); "
        f"wrote partitions {written}, skipped (already done) {skipped}"
    )
    return 0


def cmd_tiles(args) -> int:
    _ray_init(args.num_cpus)
    from .pipelines.spatial import write_tiles

    zooms = tuple(int(z) for z in args.zooms.split(","))
    if args.overwrite:
        shutil.rmtree(args.target, ignore_errors=True)
    written, skipped = write_tiles(args.source, args.target, zooms)
    print(f"tiles: wrote partitions {written}, skipped (already done) {skipped}")
    return 0


def cmd_query(args) -> int:
    """Run any registered pipeline by name; write the result to parquet.

    Makes every operator in pipelines/queries.QUERIES a first-class
    `ray job submit` target: Dataset results stream through a
    distributed write, driver-sized results (pandas) write one file.
    """
    from .pipelines.queries import QUERIES

    if args.list:
        for name in sorted(QUERIES):
            print(name)
        return 0
    if args.name not in QUERIES:
        print(f"error: unknown query '{args.name}' (see --list)", file=sys.stderr)
        return 2
    _ray_init(args.num_cpus)
    import pandas as pd

    result = QUERIES[args.name](args.source)
    if args.overwrite:
        shutil.rmtree(args.target, ignore_errors=True)
    if isinstance(result, pd.DataFrame):
        import pathlib

        import pyarrow as pa
        import pyarrow.parquet as pq

        out = pathlib.Path(args.target)
        out.mkdir(parents=True, exist_ok=True)
        pq.write_table(
            pa.Table.from_pandas(result, preserve_index=False),
            out / "part-0.parquet",
        )
        n = len(result)
    else:
        result.write_parquet(args.target)
        import pyarrow.parquet as pq
        import pathlib

        n = sum(
            pq.read_metadata(f).num_rows
            for f in pathlib.Path(args.target).glob("*.parquet")
        )
    print(f"query {args.name}: {n} rows -> {args.target}")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="texel_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("snap", help="snap a polygon table to the tile grid")
    ps.add_argument(
        "-s", "--source", required=True, help="input parquet dir/file or .gpkg"
    )
    ps.add_argument("--table", default=None, help="gpkg table (default: first)")
    ps.add_argument("-t", "--target", required=True, help="output directory")
    ps.add_argument("--tms", default="WebMercatorQuad")
    ps.add_argument("-z", "--zooms", default="8", help="comma-separated zoom list")
    ps.add_argument("--geom-column", default="geom_wkb")
    ps.add_argument("--keep-points-and-lines", action="store_true")
    ps.add_argument(
        "--ignore-outside-grid",
        action=argparse.BooleanOptionalAction,
        default=True,
        help="skip+count outside-grid features (default); "
        "--no-ignore-outside-grid raises instead",
    )
    ps.add_argument("--reverse-winding-order", action="store_true")
    ps.add_argument("-o", "--overwrite", action="store_true")
    ps.add_argument("--num-cpus", type=int, default=None)
    ps.set_defaults(fn=cmd_snap)

    pt = sub.add_parser("tiles", help="flagship image tiling pipeline")
    pt.add_argument("-s", "--source", required=True, help="testdata sf dir")
    pt.add_argument("-t", "--target", required=True, help="output directory")
    pt.add_argument("-z", "--zooms", default="4,8")
    pt.add_argument("-o", "--overwrite", action="store_true")
    pt.add_argument("--num-cpus", type=int, default=None)
    pt.set_defaults(fn=cmd_tiles)

    pq_ = sub.add_parser(
        "query", help="run any registered pipeline by name -> parquet"
    )
    pq_.add_argument("name", nargs="?", default="", help="query name (see --list)")
    pq_.add_argument("-s", "--source", default="/root/testdata/sf0.01")
    pq_.add_argument("-t", "--target", default="/tmp/texel_ray_query")
    pq_.add_argument("-o", "--overwrite", action="store_true")
    pq_.add_argument("--list", action="store_true", help="list query names")
    pq_.add_argument("--num-cpus", type=int, default=None)
    pq_.set_defaults(fn=cmd_query)

    args = p.parse_args(argv)
    try:
        return args.fn(args)
    except (FileNotFoundError, KeyError, ValueError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 2


if __name__ == "__main__":
    sys.exit(main())
