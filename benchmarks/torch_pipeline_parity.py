"""Cross-framework END-TO-END quality parity: torch full-pipeline replica vs
satae on IDENTICAL synthetic-hard data.

The strongest accuracy-parity proxy available without real EuroSAT
(VERDICT r2 #1): the existing torch parity tests pin the train STEP
(tests/test_torch_train_parity.py, 25-step trajectory); this closes the gap
to the SELECTION PIPELINE by running the reference's complete flow —
fresh-init per config, pruned alpha x lr grid with best-val selection
(Report.md:595-730), encoder freeze + latent extraction (Report.md:2590-
2609), MLP lr grid with best-val-acc selection + test eval (Report.md:2611-
2733) — in BOTH frameworks on the same arrays, and comparing final test
accuracies.

Faithfulness notes:
  * torch side replicates the reference architecture and training semantics
    (augmentation flip -> pad-4 crop -> /255 -> N(0, 0.03) noise train-only,
    Report.md:225-238; joint loss alpha*MSE(x_hat, augmented_x)+CE,
    Report.md:649-651; Adam; sample-weighted epoch losses; per-epoch val
    pass; Adam(lr, wd=1e-4) MLP, Report.md:2625) — but uses TRUE best-epoch
    snapshots, matching satae's documented fix of the reference's shallow
    state_dict bug (SURVEY.md §2 quirks), so both sides select identically.
  * the two sides share the exact train/val/test uint8 arrays (one
    make_splits call); RNG streams necessarily differ (torch vs jax), so
    the pass criterion is a band, not equality: |acc_torch - acc_satae|
    <= --band (default 0.06 at the default reduced scale; run-to-run
    spread of EITHER framework at per_class=128/15 epochs is several
    points).

Usage: python benchmarks/torch_pipeline_parity.py [--per-class 128]
           [--ae-epochs 15] [--band 0.06] [--out benchmarks/torch_parity]
Writes <out>/torch_pipeline_parity.json. Torch runs on CPU (the reference's
fallback device, Report.md:163-167); satae on the default backend.
"""

from __future__ import annotations

import argparse
import copy
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

AE_ALPHAS = (20.0, 35.0)
AE_LRS = (1e-3, 5e-3)
MLP_LRS = (1e-4, 1e-3, 1e-2)
MLP_EPOCHS = 30
NOISE_STD = 0.03  # Report.md:229
WEIGHT_DECAY = 1e-4  # Report.md:2625
BATCH = 64  # Report.md:246


# ---------------------------------------------------------------------------
# torch replica of the reference pipeline
# ---------------------------------------------------------------------------

def _torch_models(latent_dim=64, num_classes=10):
    import torch
    import torch.nn as nn

    class Encoder(nn.Module):
        def __init__(self):
            super().__init__()
            chans = [3, 32, 64, 128, 256]  # Report.md:292-307
            blocks = []
            for i in range(4):
                blocks += [nn.Conv2d(chans[i], chans[i + 1], 3, 2, 1),
                           nn.BatchNorm2d(chans[i + 1]), nn.ReLU()]
            self.conv = nn.Sequential(*blocks)
            self.fc = nn.Linear(256 * 4 * 4, latent_dim)  # Report.md:309

        def forward(self, x):
            return self.fc(self.conv(x).flatten(1))

    class Decoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.fc = nn.Linear(latent_dim, 256 * 4 * 4)  # Report.md:365
            chans = [256, 128, 64, 32, 3]
            blocks = []
            for i in range(4):  # Report.md:370-385
                blocks.append(nn.ConvTranspose2d(chans[i], chans[i + 1],
                                                 3, 2, 1, 1))
                if i < 3:
                    blocks += [nn.BatchNorm2d(chans[i + 1]), nn.ReLU()]
            self.deconv = nn.Sequential(*blocks)

        def forward(self, z):
            x = self.fc(z).reshape(-1, 256, 4, 4)
            return torch.sigmoid(self.deconv(x))

    class SAE(nn.Module):  # Report.md:416-433
        def __init__(self):
            super().__init__()
            self.enc, self.dec = Encoder(), Decoder()
            self.h1 = nn.Linear(latent_dim, 128)
            self.h2 = nn.Linear(128, num_classes)

        def forward(self, x):
            z = self.enc(x)
            return self.dec(z), self.h2(torch.relu(self.h1(z))), z

    class MLP(nn.Module):  # Report.md:2552-2563
        def __init__(self):
            super().__init__()
            self.net = nn.Sequential(
                nn.Linear(latent_dim, 128), nn.BatchNorm1d(128), nn.ReLU(),
                nn.Dropout(0.3), nn.Linear(128, 64), nn.BatchNorm1d(64),
                nn.ReLU(), nn.Linear(64, num_classes))

        def forward(self, x):
            return self.net(x)

    return SAE, MLP


def _augment_torch(imgs_u8, gen):
    """Reference train transform on a uint8 NHWC batch: random hflip ->
    RandomCrop(64, padding=4) -> /255 -> +N(0, 0.03) (Report.md:225-234).
    Returns NCHW float tensors."""
    import torch
    import torch.nn.functional as F

    x = torch.from_numpy(imgs_u8).permute(0, 3, 1, 2).float() / 255.0
    n, _, h, w = x.shape
    flip = torch.rand(n, generator=gen) < 0.5
    x[flip] = torch.flip(x[flip], dims=(3,))
    x = F.pad(x, (4, 4, 4, 4))
    oy = torch.randint(0, 9, (n,), generator=gen)
    ox = torch.randint(0, 9, (n,), generator=gen)
    out = torch.stack([x[i, :, oy[i]:oy[i] + h, ox[i]:ox[i] + w]
                       for i in range(n)])
    out = out + NOISE_STD * torch.randn(out.shape, generator=gen)
    return out


def run_torch_pipeline(splits, ae_epochs, seed, log):
    import torch
    import torch.nn as nn

    torch.manual_seed(seed)
    SAE, MLP = _torch_models()
    mse, ce = nn.MSELoss(), nn.CrossEntropyLoss()

    def batches(n, bs, gen=None):
        order = (torch.randperm(n, generator=gen).numpy()
                 if gen is not None else np.arange(n))
        for lo in range(0, n, bs):
            yield order[lo:lo + bs]

    def eval_ae(model, ds, alpha):
        model.eval()
        tot, count = 0.0, 0
        with torch.no_grad():
            for idx in batches(len(ds), BATCH):
                x = torch.from_numpy(ds.images[idx]).permute(0, 3, 1, 2) \
                    .float() / 255.0
                y = torch.from_numpy(ds.labels[idx].astype(np.int64))
                x_hat, logits, _ = model(x)
                loss = alpha * mse(x_hat, x) + ce(logits, y)
                tot += loss.item() * len(idx)
                count += len(idx)
        return tot / count

    # -- AE grid (Report.md:595-730, pruned) --
    best_state, best_val, best_hp = None, float("inf"), None
    gen = torch.Generator().manual_seed(seed)
    for alpha in AE_ALPHAS:
        for lr in AE_LRS:
            model = SAE().train()  # fresh init per config (Report.md:619)
            opt = torch.optim.Adam(model.parameters(), lr=lr)
            cfg_best_val, cfg_best_state = float("inf"), None
            for epoch in range(ae_epochs):
                model.train()
                for idx in batches(len(splits.train), BATCH, gen):
                    x = _augment_torch(splits.train.images[idx], gen)
                    y = torch.from_numpy(
                        splits.train.labels[idx].astype(np.int64))
                    opt.zero_grad()
                    x_hat, logits, _ = model(x)
                    # MSE target is the augmented input (Report.md:649-651)
                    loss = alpha * mse(x_hat, x) + ce(logits, y)
                    loss.backward()
                    opt.step()
                val = eval_ae(model, splits.val, alpha)
                if val < cfg_best_val:
                    cfg_best_val = val
                    # TRUE best-epoch snapshot (satae semantics; the
                    # reference's .copy() kept live references, SURVEY §2)
                    cfg_best_state = copy.deepcopy(model.state_dict())
            log(f"[torch] alpha={alpha:g} lr={lr:g}: "
                f"best_val={cfg_best_val:.4f}")
            if cfg_best_val < best_val:
                best_val = cfg_best_val
                best_state = cfg_best_state
                best_hp = {"alpha": alpha, "lr": lr}

    # -- freeze + extract (Report.md:2590-2609) --
    best_ae = SAE()
    best_ae.load_state_dict(best_state)
    best_ae.eval()
    latents = {}
    with torch.no_grad():
        for name, ds in (("train", splits.train), ("val", splits.val),
                         ("test", splits.test)):
            zs = []
            for idx in batches(len(ds), 512):
                x = torch.from_numpy(ds.images[idx]).permute(0, 3, 1, 2) \
                    .float() / 255.0
                zs.append(best_ae.enc(x))
            latents[name] = (torch.cat(zs), torch.from_numpy(
                ds.labels.astype(np.int64)))

    # -- MLP grid (Report.md:2611-2733, pruned) --
    def acc(clf, split):
        clf.eval()
        with torch.no_grad():
            X, y = latents[split]
            return float((clf(X).argmax(1) == y).float().mean())

    g_best_acc, g_best_state, g_best_lr = -1.0, None, None
    for lr in MLP_LRS:
        clf = MLP().train()
        opt = torch.optim.Adam(clf.parameters(), lr=lr,
                               weight_decay=WEIGHT_DECAY)
        Xtr, ytr = latents["train"]
        lr_best_acc, lr_best_state = -1.0, None
        for epoch in range(MLP_EPOCHS):
            clf.train()
            for idx in batches(len(ytr), BATCH, gen):
                opt.zero_grad()
                loss = ce(clf(Xtr[idx]), ytr[idx])
                loss.backward()
                opt.step()
            va = acc(clf, "val")
            if va > lr_best_acc:
                lr_best_acc = va
                lr_best_state = copy.deepcopy(clf.state_dict())
        log(f"[torch] mlp lr={lr:g}: best_val_acc={lr_best_acc:.4f}")
        if lr_best_acc > g_best_acc:
            g_best_acc, g_best_state, g_best_lr = lr_best_acc, \
                lr_best_state, lr
    best_clf = MLP()
    best_clf.load_state_dict(g_best_state)
    test_acc = acc(best_clf, "test")
    return {"ae_best_val_loss": best_val, "ae_hparams": best_hp,
            "mlp_best_val_acc": g_best_acc, "mlp_lr": g_best_lr,
            "test_acc": test_acc}


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-class", type=int, default=128)
    ap.add_argument("--ae-epochs", type=int, default=15)
    ap.add_argument("--band", type=float, default=0.06,
                    help="max |acc_torch - acc_satae| to pass")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="benchmarks/torch_parity")
    ap.add_argument("--cpu", action="store_true",
                    help="run the satae side on CPU too (TPU-relay-outage "
                         "fallback; quality numbers are platform-portable)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from satae.api import SatAEPipeline
    from satae.config import (AETrainConfig, DataConfig, MLPTrainConfig,
                              PipelineConfig, RuntimeConfig)
    from satae.data.ingest import load_dataset
    from satae.data.pipeline import make_splits

    log = lambda s: print(s, flush=True)
    data_cfg = DataConfig(per_class=args.per_class,
                          synthetic_difficulty="hard")
    cfg = PipelineConfig(
        data=data_cfg,
        ae=AETrainConfig(alphas=AE_ALPHAS, learning_rates=AE_LRS,
                         max_epochs=args.ae_epochs, patience=args.ae_epochs),
        mlp=MLPTrainConfig(learning_rates=MLP_LRS, epochs=MLP_EPOCHS),
        # --seed reseeds BOTH frameworks' training streams (the data split
        # stays fixed: make_synthetic_eurosat/make_splits use data-config
        # seeds, so every seed trains on the identical arrays)
        runtime=RuntimeConfig(seed=args.seed),
    )
    raw = load_dataset(data_cfg)
    splits = make_splits(raw, data_cfg)  # the ONE split both sides consume
    log(f"data: {len(splits.train)}/{len(splits.val)}/{len(splits.test)} "
        "train/val/test (synthetic-hard)")

    t0 = time.perf_counter()
    torch_res = run_torch_pipeline(splits, args.ae_epochs, args.seed, log)
    torch_s = round(time.perf_counter() - t0, 1)
    log(f"[torch] test_acc={torch_res['test_acc']:.4f} ({torch_s} s)")

    t0 = time.perf_counter()
    summary = SatAEPipeline(cfg).fit(raw, grid=True)
    satae_s = round(time.perf_counter() - t0, 1)
    log(f"[satae] test_acc={summary.test_acc:.4f} ({satae_s} s)")

    gap = abs(torch_res["test_acc"] - summary.test_acc)
    result = {
        "per_class": args.per_class, "ae_epochs": args.ae_epochs,
        "ae_grid": {"alphas": AE_ALPHAS, "lrs": AE_LRS},
        "mlp_lrs": MLP_LRS, "mlp_epochs": MLP_EPOCHS, "seed": args.seed,
        "torch": torch_res,
        "satae": {"ae_best_val_loss": summary.ae_val_loss,
                  "ae_hparams": summary.ae_hparams,
                  "mlp_best_val_acc": summary.mlp_val_acc,
                  "mlp_hparams": summary.mlp_hparams,
                  "test_acc": summary.test_acc},
        "test_acc_gap": round(gap, 4),
        "band": args.band,
        "pass": bool(gap <= args.band),
        "torch_seconds": torch_s, "satae_seconds": satae_s,
    }
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    (out / "torch_pipeline_parity.json").write_text(
        json.dumps(result, indent=2))
    print(json.dumps(result, indent=2))
    if not result["pass"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
