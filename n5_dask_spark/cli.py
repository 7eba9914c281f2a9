"""Command-line surface mirroring the reference's six scripts, Spark-backed.

A user of JaneliaSciComp/n5-dask drives it via CLIs; this module exposes the
same operations (with the same flag vocabulary where it exists) on this
engine:

  python -m n5_dask_spark tif-to-n5      (reference src/tif_to_n5.py:63-101)
  python -m n5_dask_spark n5-to-tif      (reference src/n5_to_tif.py:54-86)
  python -m n5_dask_spark create-n5      (reference src/create_n5.py:40-63)
  python -m n5_dask_spark n5-multiscale  (reference src/n5_multiscale.py:139-211)
  python -m n5_dask_spark ometif-to-n5   (reference src/ometif_to_n5.py:209-292)
  python -m n5_dask_spark n5-info        (read attrs / region, src/n5_utils.py)

Replacements for reference-isms: `--dask-scheduler` becomes `--cpus` (local
Spark parallelism) / `--master` (any Spark master URL); dask yaml config
injection becomes repeated `--conf key=value` (applied to the SparkSession,
the SparkConf analog of src/n5_multiscale.py:177-182).
"""

from __future__ import annotations

import argparse
import json
import sys

from n5_dask_spark.session import get_spark

COMPRESSION_IDS = ("raw", "gzip", "bz2", "xz", "lz4", "blosc", "zstd", "same")


def _parse_ints(s: str) -> list[int]:
    return [int(x) for x in s.replace(" ", "").split(",")]


def _compression(arg: str) -> dict | str:
    if arg == "same":
        return "same"
    if arg == "raw":
        return {"type": "raw"}
    if arg == "gzip":
        return {"type": "gzip", "useZlib": False, "level": -1}
    if arg == "bz2":
        return {"type": "bzip2"}
    if arg == "xz":
        return {"type": "xz"}
    if arg == "lz4":
        return {"type": "lz4", "blockSize": 65536}
    if arg == "blosc":
        # n5-blosc defaults (cname=lz4, byte-shuffle); typesize is refined
        # to the dataset dtype at write time by the codec layer
        return {"type": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1, "typesize": 1}
    if arg == "zstd":
        # n5-zstd ecosystem extension (bare zstd frame per block)
        return {"type": "zstd", "level": 3}
    raise argparse.ArgumentTypeError(f"unknown compression {arg!r} (known: {COMPRESSION_IDS})")


def _spark(args: argparse.Namespace):
    # --conf must reach the BUILDER: static/core confs (executor memory etc.)
    # cannot be set after getOrCreate
    extra = {}
    for kv in args.conf or []:
        key, sep, value = kv.partition("=")
        if not sep or not key:
            raise SystemExit(f"--conf expects key=value, got {kv!r}")
        extra[key] = value
    spark = get_spark("n5_dask_spark-cli", cpus=args.cpus, extra_conf=extra)
    # record the user's explicit keys so tune_session's tuning defaults
    # (shuffle partitions, AQE, broadcast threshold) never stomp them —
    # determinism confs (UTC tz etc.) still always apply
    spark._n5ds_user_confs = frozenset(extra)
    return spark


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--cpus", type=int, default=None, help="local[] parallelism")
    p.add_argument("--conf", action="append", help="spark conf key=value (repeatable)")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="n5_dask_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("tif-to-n5", help="TIFF series -> N5 volume")
    p.add_argument("-i", "--input", required=True, help="directory of *.tif slices")
    p.add_argument("-o", "--output", required=True, help="output N5 container")
    p.add_argument("-d", "--data_set", default="/s0")
    p.add_argument("-c", "--chunk_size", default="512,512,512")
    p.add_argument("--compression", default="bz2", type=_compression)
    p.add_argument("--dtype", default="same")
    _add_common(p)

    p = sub.add_parser("n5-to-tif", help="N5 volume -> TIFF series or single region")
    p.add_argument("-i", "--input", required=True, help="N5 container")
    p.add_argument("-d", "--data_set", required=True)
    p.add_argument("-o", "--output", required=True, help="output dir (series) or file (region)")
    p.add_argument("--start", help="x,y,z region start (region export)")
    p.add_argument("--end", help="x,y,z region end (region export)")
    p.add_argument("--dtype", default="same")
    _add_common(p)

    p = sub.add_parser("create-n5", help="create empty dataset from template")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("-d", "--data_set", default="/s0", help="output dataset path")
    p.add_argument("-t", "--template", required=True, help="template container")
    p.add_argument("--template_data_set", default="/s0")
    p.add_argument("--compression", default="same", type=_compression)
    p.add_argument("--dtype", default="same")

    p = sub.add_parser("n5-multiscale", help="build downsample pyramid")
    p.add_argument("-i", "--input", required=True, help="N5 container")
    p.add_argument("-d", "--data_set", required=True, help="group holding s0 (e.g. mri/c0)")
    p.add_argument("-f", "--downsampling_factors", default="2,2,2")
    p.add_argument("--thumbnail_size", default=None, help="x,y,z cutoff (default: block size)")
    _add_common(p)

    p = sub.add_parser("ometif-to-n5", help="multichannel TIFF -> per-channel N5")
    p.add_argument("-i", "--input", required=True, help="multi-page .tif")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("-d", "--data_set", default="s0")
    p.add_argument("-g", "--group", default="")
    p.add_argument("-c", "--chunk_size", default="128,128,128")
    # both default to the OME-XML in the file's ImageDescription
    p.add_argument("--n_channels", type=int, default=None)
    p.add_argument("--dim_order", choices=("cz", "zc"), default=None)
    p.add_argument("--compression", default="raw", type=_compression)
    _add_common(p)

    p = sub.add_parser("n5-info", help="print attributes / region stats as JSON")
    p.add_argument("-i", "--input", required=True)
    p.add_argument("-d", "--data_set", required=True)
    p.add_argument("--start", help="x,y,z")
    p.add_argument("--end", help="x,y,z")
    _add_common(p)

    args = ap.parse_args(argv)

    if args.cmd == "tif-to-n5":
        from n5_dask_spark.sources.tiff import tif_series_to_n5

        if args.compression == "same":
            ap.error("--compression same requires a template; valid only for create-n5")
        attrs = tif_series_to_n5(
            _spark(args),
            args.input,
            args.output,
            args.data_set.strip("/"),
            _parse_ints(args.chunk_size),
            compression=args.compression,
            data_type=args.dtype,
        )
        print(json.dumps({"written": args.output, "attributes": attrs.to_json()}))
    elif args.cmd == "n5-to-tif":
        if bool(args.start) != bool(args.end):
            ap.error("--start and --end must be given together")
        if args.start and args.end:
            from n5_dask_spark.sources.tiff import n5_region_to_tif

            n5_region_to_tif(
                _spark(args),
                args.input,
                args.data_set.strip("/"),
                args.output,
                _parse_ints(args.start),
                _parse_ints(args.end),
                dtype_override=args.dtype,
            )
            print(json.dumps({"written": args.output}))
        else:
            from n5_dask_spark.sources.tiff import n5_to_tif_series

            n = n5_to_tif_series(
                _spark(args), args.input, args.data_set.strip("/"), args.output,
                dtype_override=args.dtype,
            )
            print(json.dumps({"written": args.output, "slices": n}))
    elif args.cmd == "create-n5":
        from n5_dask_spark.sources.n5.writer import create_from_template

        attrs = create_from_template(
            args.template,
            args.template_data_set.strip("/"),
            args.output,
            args.data_set.strip("/"),
            compression=args.compression,
            data_type=args.dtype,
        )
        print(json.dumps({"created": args.output, "attributes": attrs.to_json()}))
    elif args.cmd == "n5-multiscale":
        from n5_dask_spark.sources.n5.transforms import build_multiscale

        levels = build_multiscale(
            _spark(args),
            args.input,
            args.data_set.strip("/"),
            factors_xyz=tuple(_parse_ints(args.downsampling_factors)),
            thumbnail_size_xyz=_parse_ints(args.thumbnail_size) if args.thumbnail_size else None,
        )
        print(json.dumps({"levels": levels}))
    elif args.cmd == "ometif-to-n5":
        from n5_dask_spark.sources.ome import ome_tif_to_n5

        if args.compression == "same":
            ap.error("--compression same requires a template; valid only for create-n5")
        attrs = ome_tif_to_n5(
            _spark(args),
            args.input,
            args.output,
            args.group.strip("/"),
            _parse_ints(args.chunk_size),
            n_channels=args.n_channels,
            dim_order=args.dim_order,
            compression=args.compression,
            dataset=args.data_set.strip("/"),
        )
        print(json.dumps({"channels": len(attrs), "attributes": attrs[0].to_json()}))
    elif args.cmd == "n5-info":
        from n5_dask_spark.sources.n5.metadata import read_raw_attributes

        out = {"attributes": read_raw_attributes(args.input, args.data_set.strip("/"))}
        if bool(args.start) != bool(args.end):
            ap.error("--start and --end must be given together")
        if args.start and args.end:
            from n5_dask_spark.sources.n5.reader import read_region

            reg = read_region(
                _spark(args), args.input, args.data_set.strip("/"),
                _parse_ints(args.start), _parse_ints(args.end),
            )
            out["region"] = {
                "shape_xyz": list(reg.shape),
                "min": float(reg.min()),
                "max": float(reg.max()),
                "mean": float(reg.mean()),
            }
        print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
