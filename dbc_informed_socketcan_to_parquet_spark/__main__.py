"""CLI front-end — argument-surface parity with the reference binary
(C1, /root/reference/src/arguments.h:40-110), minus its parsing bugs
(``--forward-fill``/``--no-adjust-timestamp`` swallowing the next token,
arguments.h:84-85,95-96,106 — argparse gets this right for free).

    python -m dbc_informed_socketcan_to_parquet_spark fs.dbc \
        --if capture.log --of out.parquet --cache 10 --file \
        --live-decode ACC_STATUS_GLV_VOLTAGE
"""

from __future__ import annotations

import argparse

from dbc_informed_socketcan_to_parquet_spark.plans.pipeline import DecodePipeline, PipelineConfig
from dbc_informed_socketcan_to_parquet_spark.session import get_spark


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="dbc_informed_socketcan_to_parquet_spark")
    p.add_argument("dbc", help="DBC signal-dictionary file")
    p.add_argument("--if", dest="input_path", help="input file (candump log or parquet)")
    p.add_argument("--of", dest="output_path", help="output parquet path")
    p.add_argument("--file", dest="fmt", action="store_const", const="file", default="file")
    p.add_argument("--parquet", dest="fmt", action="store_const", const="parquet")
    p.add_argument("--stdin", dest="fmt", action="store_const", const="stdin")
    p.add_argument("--socket", dest="socket_name", default=None, help="stream from TCP socket host:port")
    p.add_argument("--cache", type=float, default=0.0, help="bucket width in ms (0 = row per message)")
    p.add_argument("--forward-fill", action="store_true")
    p.add_argument("--live-decode", action="append", default=[], metavar="SIGNAL")
    p.add_argument("--no-adjust-timestamp", action="store_true")
    p.add_argument("--first-wins", action="store_true", help="v2 first-write-wins bucket semantics")
    return p


def main(argv: list[str] | None = None) -> None:
    args = build_parser().parse_args(argv)
    cfg = PipelineConfig(
        dbc_path=args.dbc,
        input_path=args.input_path,
        output_path=args.output_path,
        input_format=args.fmt,
        cache_ms=args.cache,
        forward_fill=args.forward_fill,
        live_signals=args.live_decode,
        adjust_timestamp=not args.no_adjust_timestamp,
        agg="first" if args.first_wins else "last",
    )
    spark = get_spark("dbc-decode-cli")
    if args.socket_name:
        from dbc_informed_socketcan_to_parquet_spark.streaming.pipeline import run_stream

        host, _, port = args.socket_name.partition(":")
        run_stream(spark, cfg, host=host or "localhost", port=int(port or 9000))
        return
    n = DecodePipeline(cfg).run_batch(spark).count()
    print(f"wrote {n} rows")


if __name__ == "__main__":
    main()
