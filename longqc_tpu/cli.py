"""Command-line interface: `python -m longqc_tpu <subcommand>`.

Mirrors the reference CLI surface (longQC.py:868-956): `sampleqc` with
the same presets/options and `runqc` for per-instrument platform QC.
"""

import argparse
import sys

from longqc_tpu._version import __version__
from longqc_tpu.config import PRESETS, DEFAULT_N_SAMPLE


def command_run(args):
    from longqc_tpu.platform import nanopore, rs, sequel
    suf = args.suf
    if args.platform == "rs2":
        rs.run_platformqc(args.raw_data_dir, args.out, suffix=suf)
    elif args.platform == "sequel":
        sequel.run_platformqc(args.raw_data_dir, args.out, suffix=suf)
    elif args.platform in ("minion", "gridion"):
        nanopore.run_platformqc(args.platform, args.raw_data_dir, args.out,
                                suffix=suf, n_channel=512)


def command_sample(args):
    from longqc_tpu.engine.pipeline import run_sampleqc
    run_sampleqc(
        args.input, args.out, args.preset,
        nsample=args.nsample, transcript=bool(args.transcript),
        suffix=args.suf, trim_out=args.trim, adp5=args.adp5,
        adp3=args.adp3, fast=bool(args.fast), mem=args.mem,
        index_size=args.inds, short=bool(args.short))


def build_parser():
    parser = argparse.ArgumentParser(
        prog="longqc_tpu",
        description="TPU-native quality control for long-read sequence data.")
    parser.add_argument("-v", "--version", action="version",
                        version="%(prog)s " + __version__)
    sub = parser.add_subparsers()

    platforms = ["rs2", "sequel", "minion", "gridion"]
    p_run = sub.add_parser("runqc", help="per-run instrument QC")
    p_run.add_argument("-s", "--suffix", dest="suf", default=None)
    p_run.add_argument("-o", "--output", dest="out", default=None)
    p_run.add_argument("platform", choices=platforms)
    p_run.add_argument("raw_data_dir", type=str)
    p_run.set_defaults(handler=command_run)

    p_s = sub.add_parser("sampleqc", help="reference-free sample QC")
    p_s.add_argument("input", help="input [fasta, fastq, pbbam or fast5 dir]")
    p_s.add_argument("-o", "--output", dest="out", required=True)
    p_s.add_argument("-x", "--preset", choices=sorted(PRESETS),
                     required=True)
    p_s.add_argument("-t", "--transcript", dest="transcript",
                     action="store_true", default=None)
    p_s.add_argument("-n", "--n_sample", dest="nsample", type=int,
                     default=DEFAULT_N_SAMPLE)
    p_s.add_argument("-s", "--sample_name", dest="suf", default=None)
    p_s.add_argument("-c", "--trim_output", dest="trim", default=None)
    p_s.add_argument("--adapter_5", dest="adp5", default=None)
    p_s.add_argument("--adapter_3", dest="adp3", default=None)
    p_s.add_argument("-f", "--fast", dest="fast", action="store_true",
                     default=None)
    p_s.add_argument("-m", "--mem", dest="mem", type=float, default=0.5)
    p_s.add_argument("-i", "--index", dest="inds", default="4G")
    p_s.add_argument("-b", "--short", dest="short", action="store_true",
                     default=None)
    p_s.set_defaults(handler=command_sample)
    return parser


def main(argv=None):
    parser = build_parser()
    args = parser.parse_args(argv)
    if hasattr(args, "handler"):
        args.handler(args)
    else:
        parser.print_help()
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
