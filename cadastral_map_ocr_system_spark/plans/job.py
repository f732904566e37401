"""spark-submit entry point (reference EP1/EP3 equivalent).

    spark-submit --py-files cadastral_map_ocr_system_spark.zip \
        -m ... job.py --input /path/docs --output /path/extracted \
        --checkpoint /path/ckpt --run-id run1 [--n-buckets 512]

Or for a synthetic run: --synth-docs 100000.

Packaging: `python -m cadastral_map_ocr_system_spark.plans.job --help`
works locally; build_pyfiles_zip() produces the --py-files artifact.
"""

from __future__ import annotations

import argparse
import os
import zipfile


def build_pyfiles_zip(out_path: str) -> str:
    """Zip the package for spark-submit --py-files."""
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = os.path.dirname(pkg_root)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirs, files in os.walk(pkg_root):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, base))
    return out_path


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="interleaved-doc extraction job")
    p.add_argument("--input", help="parquet/Iceberg docs table path")
    p.add_argument("--synth-docs", type=int, help="generate N synthetic docs instead")
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--run-id", required=True)
    p.add_argument("--n-buckets", type=int, default=64)
    p.add_argument("--buckets-per-commit", type=int, default=8)
    p.add_argument("--master", default=None)
    p.add_argument("--build-zip", help="write --py-files zip here and exit")
    args = p.parse_args(argv)

    if args.build_zip:
        print(build_pyfiles_zip(args.build_zip))
        return

    from ..session import get_spark
    from ..sources.checkpoint import run_extraction
    from .. import synth

    spark = get_spark(app_name=f"extract-{args.run_id}", master=args.master)
    if args.synth_docs:
        docs = synth.synth_docs_df(spark, args.synth_docs)
    elif args.input:
        docs = spark.read.parquet(args.input)
    else:
        p.error("one of --input / --synth-docs is required")
    run_extraction(
        spark,
        docs,
        output_path=args.output,
        checkpoint_path=args.checkpoint,
        run_id=args.run_id,
        n_buckets=args.n_buckets,
        buckets_per_commit=args.buckets_per_commit,
    )
    spark.stop()


if __name__ == "__main__":
    main()
