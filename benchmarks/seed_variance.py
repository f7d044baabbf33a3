"""Seed-variance study: how much does the reduced selection pipeline's test
accuracy move under training-seed changes alone?

Context for the cross-framework parity artifacts (torch_parity*/): the
torch-vs-satae test-accuracy gaps measured there (0.000/0.021/0.016 at
seeds 0/1/2) can only be interpreted against the pipeline's OWN seed noise.
This runs the identical satae-side reduced pipeline (same grid, epochs, and
synthetic-hard arrays as benchmarks/torch_pipeline_parity.py — the data
split stays fixed across seeds; only the training streams reseed) at N
seeds and records the spread. If |torch - satae| gaps sit within ~1 sd of
satae's own seed spread, the frameworks are indistinguishable in quality.

Writes benchmarks/seed_variance.json.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from torch_pipeline_parity import (AE_ALPHAS, AE_LRS, MLP_EPOCHS,  # noqa: E402
                                   MLP_LRS)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-class", type=int, default=128)
    ap.add_argument("--ae-epochs", type=int, default=15)
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--out", default="benchmarks/seed_variance.json")
    args = ap.parse_args()

    from satae.api import SatAEPipeline
    from satae.config import (AETrainConfig, DataConfig, MLPTrainConfig,
                              PipelineConfig, RuntimeConfig)
    from satae.data.ingest import load_dataset

    data_cfg = DataConfig(per_class=args.per_class,
                          synthetic_difficulty="hard")
    raw = load_dataset(data_cfg)
    runs = []
    for seed in range(args.seeds):
        cfg = PipelineConfig(
            data=data_cfg,
            ae=AETrainConfig(alphas=AE_ALPHAS, learning_rates=AE_LRS,
                             max_epochs=args.ae_epochs,
                             patience=args.ae_epochs),
            mlp=MLPTrainConfig(learning_rates=MLP_LRS, epochs=MLP_EPOCHS),
            runtime=RuntimeConfig(seed=seed),
        )
        t0 = time.perf_counter()
        summary = SatAEPipeline(cfg).fit(raw, grid=True)
        runs.append({"seed": seed, "test_acc": summary.test_acc,
                     "ae_hparams": summary.ae_hparams,
                     "mlp_lr": summary.mlp_hparams.get("lr"),
                     "seconds": round(time.perf_counter() - t0, 1)})
        print(f"seed {seed}: test_acc={summary.test_acc:.4f} "
              f"({runs[-1]['seconds']} s)", flush=True)

    accs = [r["test_acc"] for r in runs]
    out = {
        "per_class": args.per_class, "ae_epochs": args.ae_epochs,
        "ae_grid": {"alphas": AE_ALPHAS, "lrs": AE_LRS},
        "mlp_lrs": MLP_LRS, "mlp_epochs": MLP_EPOCHS,
        "runs": runs,
        "mean": round(statistics.mean(accs), 4),
        "stdev": round(statistics.stdev(accs), 4) if len(accs) > 1 else None,
        "range": round(max(accs) - min(accs), 4),
        "cross_framework_gaps_for_context": [0.0, 0.0212, 0.0159],
    }
    Path(args.out).write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
