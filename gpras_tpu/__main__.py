"""Command-line entry points (the reference has no CLI — every entry point is a
hard-coded ``__main__`` block, SURVEY.md section 1; this is the missing layer).

Usage:
    python -m gpras_tpu run <config.json>          # end-to-end pipeline
    python -m gpras_tpu cv <config.json> <sweep>   # kernels|modes|inducing|optimizers
    python -m gpras_tpu select-events <sst.pq> <out.stac.json> [...]
    python -m gpras_tpu make-runs <settings.json>
    python -m gpras_tpu predict <model.npz> <in.npz> <out.npz> \
        --hf-pre <hf.npz> --lf-pre <lf.npz>        # serve saved artifacts
    python -m gpras_tpu describe-config            # config field reference
"""

from __future__ import annotations

import argparse
import json
import logging
import sys


def main(argv: list[str] | None = None) -> int:
    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(name)s: %(message)s")
    parser = argparse.ArgumentParser(prog="gpras_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    run_p = sub.add_parser("run", help="run the end-to-end pipeline")
    run_p.add_argument("config")

    cv_p = sub.add_parser("cv", help="cross-validation sweeps")
    cv_p.add_argument("config")
    cv_p.add_argument("sweep", choices=["kernels", "modes", "inducing", "optimizers"])

    sel_p = sub.add_parser("select-events", help="select train/test storms from SST parquet")
    sel_p.add_argument("parquet")
    sel_p.add_argument("out_stac")
    sel_p.add_argument("--n-train", type=int, default=35)
    sel_p.add_argument("--n-test", type=int, default=14)
    sel_p.add_argument("--target-rps", default="2,5,10,25,50,100,200,500,1000,2000")
    sel_p.add_argument("--s3-prefix", default="s3://events")
    sel_p.add_argument("--test-rp-range", default="5,2000")

    mk_p = sub.add_parser("make-runs", help="generate HEC-RAS runs for selected events")
    mk_p.add_argument("settings")

    pr_p = sub.add_parser(
        "predict", help="serve predictions from saved artifacts")
    pr_p.add_argument("model", help="GPRAS checkpoint (.npz)")
    pr_p.add_argument("input", help="npz with LF cell fields under --key")
    pr_p.add_argument("output", help="output npz (field + field_var)")
    pr_p.add_argument("--hf-pre", required=True,
                      help="high-fidelity PreProcessor artifact")
    pr_p.add_argument("--lf-pre", required=True,
                      help="low-fidelity PreProcessor artifact")
    pr_p.add_argument("--key", default="fields",
                      help="array key in the input npz (default: fields)")
    pr_p.add_argument("--batch", type=int, default=4096,
                      help="events per device dispatch")

    sub.add_parser("describe-config", help="print the config field reference")

    args = parser.parse_args(argv)

    if args.cmd == "run":
        from gpras_tpu.pipeline.config import Config
        from gpras_tpu.pipeline.pipeline import pipeline

        summary = pipeline(Config.from_file(args.config))
        print(json.dumps(summary, indent=2, default=str))
    elif args.cmd == "cv":
        from gpras_tpu.pipeline import cross_validation as cv

        cv.setup(args.config)
        {"kernels": cv.run_kernels, "modes": cv.run_spatial_modes,
         "inducing": cv.run_inducing_points,
         "optimizers": cv.run_optimization_method}[args.sweep](args.config)
    elif args.cmd == "select-events":
        from gpras_tpu.pipeline.event_selection import EventSelection, write_events_stac

        rp_range = [float(v) for v in args.test_rp_range.split(",")]
        sel = EventSelection(args.parquet, test_rp_range=rp_range)
        storms, _ = sel.run_selection(
            args.n_train, args.n_test,
            [float(v) for v in args.target_rps.split(",")])
        write_events_stac(storms, args.s3_prefix, args.out_stac)
        print(f"wrote {args.out_stac}")
    elif args.cmd == "make-runs":
        from gpras_tpu.pipeline.run_maker import make_runs_from_selected_events

        manifest = make_runs_from_selected_events(args.settings)
        print(f"created {len(manifest)} runs")
    elif args.cmd == "predict":
        import numpy as np

        from gpras_tpu.gp.serving import PosteriorPredictor

        server = PosteriorPredictor(args.model,
                                    hf_preprocessor_path=args.hf_pre,
                                    lf_preprocessor_path=args.lf_pre)
        with np.load(args.input) as z:
            if args.key not in z:
                raise SystemExit(
                    f"key {args.key!r} not in {args.input} "
                    f"(has: {', '.join(z.files)})")
            fields = np.asarray(z[args.key])
        if fields.ndim != 2:
            raise SystemExit(f"--key {args.key!r} must be a 2-D "
                             f"(events, cells) array, got {fields.shape}")
        means, variances = [], []
        for i in range(0, fields.shape[0], args.batch):
            f, fv = server.predict_field(fields[i:i + args.batch])
            means.append(f)
            variances.append(fv)
        np.savez_compressed(args.output,
                            field=np.concatenate(means),
                            field_var=np.concatenate(variances))
        print(f"wrote {args.output}: {fields.shape[0]} events -> "
              f"{means[0].shape[1]} cells")
    elif args.cmd == "describe-config":
        from gpras_tpu.pipeline.config import Config

        print(Config.describe())
    return 0


if __name__ == "__main__":
    sys.exit(main())
