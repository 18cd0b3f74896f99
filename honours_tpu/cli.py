"""Command-line interface.

  python -m honours_tpu press   IN.blow5 OUT.blow5 [--codec NAME]
  python -m honours_tpu depress IN.blow5 OUT.blow5 [--signal-codec NAME]
  python -m honours_tpu bench   IN.blow5 [--methods a,b][--per-read]
  python -m honours_tpu codecs

`press` rewrites a SLOW5/BLOW5 file with the signal field compressed by
any registered codec (default: the drans flagship); `depress` restores a
stock BLOW5 (svb-zd signal, zlib records) readable by standard tooling.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="honours_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("press", help="compress signal field with a codec")
    p.add_argument("infile")
    p.add_argument("outfile")
    # drans is the default: the only flagship whose ratio claim carries
    # no canned-table train/test caveat (the stream fits its own model)
    p.add_argument("--codec", default="drans_vbbe21_zd")
    p.add_argument(
        "--tpu", action="store_true",
        help="route reads through the batched device engines "
             "(bucketed, byte-identical streams; host fallback for "
             "exception-cap overflows)",
    )

    d = sub.add_parser("depress", help="restore stock BLOW5")
    d.add_argument("infile")
    d.add_argument("outfile")
    d.add_argument("--tpu", action="store_true",
                   help="decode through the batched device engines")

    b = sub.add_parser("bench", help="round-trip benchmark (reference TSV)")
    b.add_argument("file")
    b.add_argument("--methods", default=None)
    b.add_argument("--per-read", action="store_true")
    b.add_argument("--tpu", action="store_true",
                   help="bench the batched engine paths (TSV rows for "
                        "the engine-backed methods)")

    sub.add_parser("codecs", help="list registered codecs")

    a = sub.add_parser("analyze", help="signal statistics report (viz/ role)")
    a.add_argument("file")
    a.add_argument("--per-read", action="store_true")

    args = ap.parse_args(argv)

    if args.cmd == "codecs":
        from honours_tpu.codecs import base as registry

        print("\n".join(registry.names()))
        return 0

    if args.cmd == "analyze":
        import json

        from honours_tpu import analysis
        from honours_tpu.io import blow5

        rep = analysis.analyze_reads(
            [r.signal for r in blow5.read_blow5(args.file).reads]
        )
        if not args.per_read:
            rep = rep["aggregate"]
        print(json.dumps(rep, indent=1))
        return 0

    if args.cmd == "bench":
        from honours_tpu.bench import harness

        forward = [args.file]
        if args.methods:
            forward += ["--methods", args.methods]
        if args.per_read:
            forward += ["--per-read"]
        if args.tpu:
            forward += ["--tpu"]
        return harness.main(forward)

    from honours_tpu.io import blow5

    if args.cmd == "press":
        f5 = blow5.read_blow5(args.infile)
        streams = None
        if args.tpu:
            from honours_tpu.engine import runner

            streams = runner.press_signals_tpu(
                [r.signal for r in f5.reads], args.codec
            )
        blow5.write_blow5(
            args.outfile, f5, signal_codec=args.codec, signal_streams=streams
        )
    else:
        f5 = blow5.read_blow5(args.infile, decode_signal=not args.tpu)
        if args.tpu and f5.signal_press == blow5.SIGNAL_PRESS_HTPU:
            from honours_tpu.engine import runner

            name = blow5.htpu_codec_name(f5.header)
            sigs = runner.depress_signals_tpu(
                [r.signal_stream for r in f5.reads],
                [r.signal_len for r in f5.reads],
                name,
            )
            for r, s in zip(f5.reads, sigs):
                r.signal = s
                r.signal_stream = None
        f5.signal_press = blow5.SIGNAL_PRESS_SVB_ZD
        blow5.write_blow5(args.outfile, f5)
    print(
        f"{args.infile} ({os.path.getsize(args.infile)} B) -> "
        f"{args.outfile} ({os.path.getsize(args.outfile)} B)",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
