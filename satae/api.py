"""Public API: fit / encode / predict (BASELINE.json north-star surface).

``SatAEPipeline`` packages the full reference notebook flow (SURVEY.md §0):
ingest -> subsample -> split -> supervised-AE training (single config or the
45-config grid) -> frozen-encoder latent extraction -> MLP training (single
lr or the 11-lr grid) -> evaluation. Module-level :func:`fit`,
:func:`encode`, :func:`predict` are thin conveniences over it.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from satae.config import PipelineConfig, default_config
from satae.data.ingest import RawDataset, load_dataset
from satae.data.pipeline import ArrayDataset, make_splits
from satae.eval import metrics as M
from satae.io.checkpoint import load_model, save_model
from satae.models.mlp import mlp_init
from satae.models.supervised_ae import supervised_ae_init
from satae.train import steps as S
from satae.train.extract import extract_features, make_encode_step
from satae.train.gridsearch import ae_grid_search, mlp_grid_search

# Reference-optimal single-config hyperparameters (Report.md:2407, 3117):
BEST_ALPHA = 35.0
BEST_AE_LR = 5e-3
BEST_MLP_LR = 1e-4


def _grid_mesh(cfg: PipelineConfig):
    """The config-parallel sweep mesh: one grid config per mesh row per
    round; ``grid_dp>1`` adds a data axis so each config trains
    data-parallel (2-D config x data mesh). One helper for the AE and MLP
    sweeps so the divisibility validation applies to every path (incl.
    reuse_ae fits that skip the AE sweep)."""
    from satae.parallel import make_grid_mesh, make_mesh
    if cfg.runtime.grid_dp > 1:
        if cfg.runtime.n_devices % cfg.runtime.grid_dp:
            raise ValueError(
                f"n_devices ({cfg.runtime.n_devices}) must be "
                f"divisible by grid_dp ({cfg.runtime.grid_dp})")
        return make_grid_mesh(cfg.runtime.n_devices // cfg.runtime.grid_dp,
                              cfg.runtime.grid_dp)
    return make_mesh(cfg.runtime.n_devices, cfg.runtime.mesh_axis)


@dataclasses.dataclass
class FitSummary:
    ae_val_loss: Optional[float]  # None for reuse_ae fits (no AE training)
    ae_hparams: Dict[str, float]
    mlp_val_acc: float
    mlp_hparams: Dict[str, float]
    test_acc: Optional[float] = None
    # wall-clock per pipeline stage (data / ae / extract / mlp / eval),
    # seconds — filled by fit() so full-scale runs record where time goes
    stage_seconds: Optional[Dict[str, float]] = None


class SatAEPipeline:
    """End-to-end hybrid autoencoder–MLP pipeline with a fit/encode/predict
    surface, jit execution throughout, and checkpointing."""

    def __init__(self, config: Optional[PipelineConfig] = None):
        self.config = config or default_config()
        self.ae_params: Any = None
        self.ae_bn_state: Any = None
        self.mlp_params: Any = None
        self.mlp_bn_state: Any = None
        self.classes = None
        self._encode_step = None
        self._encode_pad = 1  # input padding multiple (mesh device count)
        self._encode_in_sharding = None  # batch sharding for bulk uploads
        self._predict_step = None
        self._proba_step = None
        self._decode_step = None

    # -- training ----------------------------------------------------------

    def fit(self, raw: Optional[RawDataset] = None, *, grid: bool = False,
            log=None, out_dir: Optional[str] = None,
            reuse_ae: bool = False) -> FitSummary:
        """Run the full pipeline. ``grid=True`` reproduces the reference's
        45-config AE sweep + 11-lr MLP sweep; ``grid=False`` trains only the
        reference-optimal config (alpha=35, lr=5e-3; MLP lr=1e-4).

        ``reuse_ae=True`` skips autoencoder training and starts from the
        pipeline's already-loaded ``ae_params`` (via :meth:`load`,
        :meth:`load_ae`, or :meth:`load_torch`): extraction + MLP training
        (+ the 11-lr grid with ``grid=True``) + evaluation only — the
        reference notebook's own phase-2 restart, which reloads
        AE_GLOBAL_BEST.pt and trains the MLP standalone
        (Report.md:2590-2733).

        ``out_dir`` identifies ONE experiment: the sweep stores resume by
        hyperparameter key and assume the dataset and seed are unchanged
        across runs sharing the dir. The encoder->MLP pairing is
        fingerprint-guarded (``mlp_provenance.json`` — a changed encoder
        invalidates cached MLP results); a changed dataset or seed is NOT,
        so point different experiments at different dirs."""
        cfg = self.config
        from satae.parallel.distributed import maybe_initialize
        maybe_initialize(cfg.runtime.multihost)
        if cfg.runtime.debug_nans:
            from satae.utils.profiling import debug_mode
            with debug_mode(nans=True):
                return self._fit_inner(raw, grid=grid, log=log,
                                       out_dir=out_dir, reuse_ae=reuse_ae)
        return self._fit_inner(raw, grid=grid, log=log, out_dir=out_dir,
                               reuse_ae=reuse_ae)

    def _fit_inner(self, raw: Optional[RawDataset] = None, *,
                   grid: bool = False, log=None,
                   out_dir: Optional[str] = None,
                   reuse_ae: bool = False) -> FitSummary:
        import time

        cfg = self.config
        stage_t: Dict[str, float] = {}
        t_mark = time.perf_counter()

        def _stage(name: str) -> None:
            # stage boundaries are accurate because every stage ends with a
            # host readback (sweep metrics / np latents / np predictions) —
            # async dispatch cannot leak work across the mark
            nonlocal t_mark
            now = time.perf_counter()
            stage_t[name] = round(now - t_mark, 2)
            t_mark = now

        raw = raw or load_dataset(cfg.data)
        splits = make_splits(raw, cfg.data)
        self.classes = splits.classes
        dtype = cfg.compute_dtype
        inflight = None  # single-config crash-resume state, cleared only
        # once the winner checkpoint is durably written (end of fit)
        _stage("data")

        if reuse_ae:
            if self.ae_params is None or self.ae_bn_state is None:
                raise ValueError(
                    "reuse_ae=True requires a loaded autoencoder — call "
                    "load()/load_ae()/load_torch() first")
            ae_res, ae_hp = None, {"reused": True}
        elif grid:
            if cfg.runtime.n_devices:
                from satae.train.shard_sweep import ae_sharded_grid_search
                mesh = _grid_mesh(cfg)
                sweep = ae_sharded_grid_search(
                    splits.train, splits.val, model_cfg=cfg.model,
                    data_cfg=cfg.data, ae_cfg=cfg.ae, mesh=mesh,
                    seed=cfg.runtime.seed, out_dir=out_dir,
                    compute_dtype=dtype, log=log,
                    save_curves=cfg.runtime.save_grid_curves)
            elif cfg.runtime.parallel_configs:
                from satae.train.vmap_sweep import ae_vmap_grid_search
                sweep = ae_vmap_grid_search(
                    splits.train, splits.val, model_cfg=cfg.model,
                    data_cfg=cfg.data, ae_cfg=cfg.ae, seed=cfg.runtime.seed,
                    out_dir=out_dir, compute_dtype=dtype, log=log,
                    save_curves=cfg.runtime.save_grid_curves)
            else:
                sweep = ae_grid_search(
                    splits.train, splits.val, model_cfg=cfg.model,
                    data_cfg=cfg.data, ae_cfg=cfg.ae, seed=cfg.runtime.seed,
                    out_dir=out_dir, compute_dtype=dtype, log=log,
                    save_curves=cfg.runtime.save_grid_curves)
            ae_res, ae_hp = sweep.best, sweep.best_hparams
        else:
            # single-config training (mesh-sharded scan epochs when
            # n_devices is set; the per-batch loop.py engine stays as the
            # step-debuggable alternative). checkpoint_every>0 + out_dir
            # flushes in-flight train state for mid-training crash resume.
            from satae.train.fast_loop import train_supervised_ae_scan
            mesh = None
            if cfg.runtime.n_devices:
                from satae.parallel import make_mesh
                mesh = make_mesh(cfg.runtime.n_devices, cfg.runtime.mesh_axis)
            ckpt_kw: Dict[str, Any] = {}
            if out_dir and cfg.ae.checkpoint_every:
                inflight = Path(out_dir) / "inflight" / "ae_single.msgpack"
                ckpt_kw = dict(checkpoint_path=str(inflight),
                               checkpoint_every=cfg.ae.checkpoint_every)
            ae_res = train_supervised_ae_scan(
                splits.train, splits.val, model_cfg=cfg.model,
                data_cfg=cfg.data, alpha=BEST_ALPHA, lr=BEST_AE_LR,
                max_epochs=cfg.ae.max_epochs, patience=cfg.ae.patience,
                seed=cfg.runtime.seed, compute_dtype=dtype, log=log,
                mesh=mesh, **ckpt_kw)
            ae_hp = {"alpha": BEST_ALPHA, "lr": BEST_AE_LR}
        if ae_res is not None:
            self.ae_params, self.ae_bn_state = ae_res.params, ae_res.bn_state
            self._ae_src_dir = None  # freshly trained, no load provenance
        _stage("ae")

        # Frozen-encoder latent extraction (Report.md:2590-2609). With a
        # mesh configured, the encoder forward is batch-sharded over all
        # devices (chunks padded to a device multiple); latents are
        # numerics-identical to the single-device path
        # (tests/test_parallel.py::test_dp_extract_features_matches).
        enc_p = self.ae_params["encoder"]
        enc_s = self.ae_bn_state["encoder"]
        if cfg.runtime.n_devices:
            from satae.parallel import make_mesh
            from satae.parallel.dp import make_dp_encode_step
            ex_mesh = make_mesh(cfg.runtime.n_devices, cfg.runtime.mesh_axis)
            encode_step = make_dp_encode_step(ex_mesh, cfg.model, dtype,
                                              axis=cfg.runtime.mesh_axis)
            pad_multiple = cfg.runtime.n_devices
        else:
            encode_step = make_encode_step(cfg.model, dtype)
            pad_multiple = 1
        Xtr, ytr = extract_features(enc_p, enc_s, splits.train, cfg.model,
                                    cfg.data.batch_size, encode_step,
                                    pad_multiple=pad_multiple)
        Xva, yva = extract_features(enc_p, enc_s, splits.val, cfg.model,
                                    cfg.data.batch_size, encode_step,
                                    pad_multiple=pad_multiple)
        Xte, yte = extract_features(enc_p, enc_s, splits.test, cfg.model,
                                    cfg.data.batch_size, encode_step,
                                    pad_multiple=pad_multiple)
        _stage("extract")

        if out_dir:
            self._guard_mlp_store(out_dir)
        if grid:
            if cfg.runtime.n_devices:
                from satae.train.shard_sweep import mlp_sharded_grid_search
                # same 2-D mesh shape as the AE sweep; the MLP engine only
                # uses the config axis (per-config MLPs are tiny)
                mesh = _grid_mesh(cfg)
                msweep = mlp_sharded_grid_search(
                    Xtr, ytr, Xva, yva, model_cfg=cfg.model, mlp_cfg=cfg.mlp,
                    mesh=mesh, batch_size=cfg.data.batch_size,
                    seed=cfg.runtime.seed, out_dir=out_dir, log=log,
                    test_x=Xte, test_y=yte,
                    save_curves=cfg.runtime.save_grid_curves)
            elif cfg.runtime.parallel_configs:
                from satae.train.vmap_sweep import mlp_vmap_grid_search
                msweep = mlp_vmap_grid_search(
                    Xtr, ytr, Xva, yva, model_cfg=cfg.model, mlp_cfg=cfg.mlp,
                    batch_size=cfg.data.batch_size, seed=cfg.runtime.seed,
                    out_dir=out_dir, log=log, test_x=Xte, test_y=yte,
                    save_curves=cfg.runtime.save_grid_curves)
            else:
                msweep = mlp_grid_search(
                    Xtr, ytr, Xva, yva, model_cfg=cfg.model, mlp_cfg=cfg.mlp,
                    batch_size=cfg.data.batch_size, seed=cfg.runtime.seed,
                    out_dir=out_dir, log=log, test_x=Xte, test_y=yte,
                    save_curves=cfg.runtime.save_grid_curves)
            mlp_res, mlp_hp = msweep.best, msweep.best_hparams
        else:
            from satae.train.fast_loop import train_mlp_scan
            mlp_res = train_mlp_scan(
                Xtr, ytr, Xva, yva, model_cfg=cfg.model, lr=BEST_MLP_LR,
                weight_decay=cfg.mlp.weight_decay, epochs=cfg.mlp.epochs,
                batch_size=cfg.data.batch_size, seed=cfg.runtime.seed, log=log)
            mlp_hp = {"lr": BEST_MLP_LR}
        self.mlp_params, self.mlp_bn_state = mlp_res.params, mlp_res.bn_state
        self._encode_step = None
        self._predict_step = None
        self._proba_step = None
        self._decode_step = None
        _stage("mlp")

        # final test evaluation on the already-extracted latents (no second
        # encoder pass over the test split)
        predict = S.make_mlp_predict(cfg.model)
        test_preds = np.asarray(predict(self.mlp_params, self.mlp_bn_state,
                                        Xte))
        test_acc = float((test_preds == yte).mean())
        _stage("eval")
        summary = FitSummary(
            ae_res.best_val_loss if ae_res is not None else None, ae_hp,
            mlp_res.best_val_acc, mlp_hp, test_acc,
            stage_seconds=dict(stage_t))
        if out_dir:
            if not grid:
                # grid sweeps already checkpointed their winners (SweepBook /
                # save_best_checkpoint) with full selection meta incl. the
                # 'diverged' marker — re-saving here would clobber it; only
                # the single-config path needs the save (its trainer writes
                # nothing). Everything below (summary/classes/curves) is
                # written for grid fits too: load() and evaluate() need
                # classes.json regardless of the engine that trained.
                from satae.train.sweep_common import save_best_checkpoint
                if ae_res is not None:
                    save_best_checkpoint(out_dir, "ae_global_best",
                                         self.ae_params, self.ae_bn_state,
                                         ae_hp, ae_res)
                save_best_checkpoint(out_dir, "mlp_global_best",
                                     self.mlp_params, self.mlp_bn_state,
                                     mlp_hp, mlp_res)
                if inflight is not None:
                    # the AE winner is durably checkpointed NOW — only here
                    # is it safe to drop the in-flight resume state (doing
                    # it right after training reopened the crash window for
                    # a kill during extract/mlp, losing the whole AE run)
                    from satae.io.checkpoint import clear_train_state
                    clear_train_state(inflight)
            same_src = (getattr(self, "_ae_src_dir", None)
                        == str(Path(out_dir).resolve()))
            if reuse_ae and not same_src:
                # make out_dir a complete, load()-able run dir when the
                # encoder came from elsewhere (a torch AE_GLOBAL_BEST.pt or
                # another run dir) — even overwriting a stale checkpoint, so
                # the dir's AE always matches the MLP just trained on it.
                # ONLY the same-dir flow skips the save: there the file IS
                # the loaded encoder, and rewriting it would clobber the
                # winner's selection meta (alpha/lr/best_val_loss/diverged)
                # that SweepBook's resume protection reads back.
                save_model(Path(out_dir) / "ae_global_best.msgpack",
                           self.ae_params, self.ae_bn_state, meta=dict(ae_hp))
            from satae.io.checkpoint import dump_strict_json
            (Path(out_dir) / "fit_summary.json").write_text(
                dump_strict_json(dataclasses.asdict(summary), indent=2))
            if self.classes:
                (Path(out_dir) / "classes.json").write_text(
                    json.dumps(list(self.classes)))
            from satae.eval import plots
            if ae_res is not None and ae_res.history:
                plots.loss_curves(ae_res.history,
                                  Path(out_dir) / "ae_best_curves.png",
                                  title=f"Best AE ({ae_hp})")
            if mlp_res.history:
                plots.accuracy_curves(mlp_res.history,
                                      Path(out_dir) / "mlp_best_curves.png",
                                      title=f"Best MLP ({mlp_hp})")
        return summary

    def _guard_mlp_store(self, out_dir: str) -> None:
        """Invalidate MLP artifacts trained on a DIFFERENT encoder's latents.

        ``mlp_results.json`` caching and the ``mlp_global_best`` resume
        competition (SweepBook) both assume the latents — hence the encoder
        — are unchanged across runs sharing ``out_dir``. A reused or
        imported AE (``reuse_ae=True`` after ``load_torch``/``load_ae``)
        breaks that silently: cached lr results and the recorded winner
        would pair a stale MLP with the new encoder's latents. Each fit
        stamps ``mlp_provenance.json`` with a fingerprint of the encoder
        actually used for extraction; a mismatch clears the store and the
        global-best pair so the MLP stage starts clean."""
        import hashlib

        from flax import serialization

        enc = jax.device_get({"p": self.ae_params["encoder"],
                              "s": self.ae_bn_state["encoder"]})
        fp = hashlib.sha1(serialization.to_bytes(enc)).hexdigest()
        out = Path(out_dir)
        prov = out / "mlp_provenance.json"
        old = None
        if prov.exists():
            try:
                old = json.loads(prov.read_text()).get("ae_fingerprint")
            except (json.JSONDecodeError, OSError):
                old = None
        if old is not None and old != fp:
            for name in ("mlp_results.json", "mlp_global_best.msgpack",
                         "mlp_global_best.json"):
                (out / name).unlink(missing_ok=True)
        out.mkdir(parents=True, exist_ok=True)
        prov.write_text(json.dumps({"ae_fingerprint": fp}))

    # -- inference ---------------------------------------------------------

    @staticmethod
    def _to_uint8(images: np.ndarray) -> np.ndarray:
        """Accept uint8 images or floats in [0,1] (rounded back to the uint8
        grid). Floats on a 0-255 scale are rejected rather than silently
        saturated — the caller must divide by 255 or pass uint8."""
        imgs = np.asarray(images)
        if imgs.dtype == np.uint8:
            return imgs
        mx = float(imgs.max(initial=0.0))
        if mx > 1.0 + 1e-3:
            raise ValueError(
                f"float images must be normalized to [0,1] (max={mx:.3g}); "
                "pass uint8 for raw 0-255 pixel values")
        mn = float(imgs.min(initial=0.0))
        if mn < -1e-3:
            raise ValueError(
                f"float images must be normalized to [0,1] (min={mn:.3g}); "
                "[-1,1]-standardized inputs would have every negative pixel "
                "silently clipped to 0")
        return np.rint(np.clip(imgs, 0.0, 1.0) * 255.0).astype(np.uint8)

    def _use_pallas(self) -> bool:
        from satae.kernels import pallas_enabled
        return self.config.runtime.use_pallas or pallas_enabled()

    def _infer_trees(self, *trees):
        """Pre-cast ENCODER inference pytrees to the compute dtype ONCE on
        first use (vs per-call astype inside the jit): measured +2% on bf16
        encode+classify at batch 4096, numerics identical (the same cast,
        hoisted out of the program) — benchmarks/bf16_infer_probe.py.

        Applied to the encoder and decoder paths only: their activations run
        at the compute dtype, so the hoist is a no-op numerically. The MLP
        predict path consumes float32 latents (encode returns f32 to the
        host), so its layers cast params UP to f32 — pre-casting those trees
        down to bf16 would truncate weights for zero speedup."""
        dt = self.config.compute_dtype
        if dt == jnp.float32:
            return trees
        cast = lambda t: jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, dt), t)
        return tuple(cast(t) for t in trees)

    def _infer_mesh(self):
        """The serving device mesh (``RuntimeConfig.n_devices`` set), built
        once and shared by the encode and decode steps."""
        if getattr(self, "_mesh", None) is None:
            from satae.parallel import make_mesh
            self._mesh = make_mesh(self.config.runtime.n_devices,
                                   self.config.runtime.mesh_axis)
        return self._mesh

    def _ensure_infer_steps(self) -> None:
        """Build the jit'd encode/predict steps lazily, and refresh the
        pre-cast encoder trees whenever ae_params/ae_bn_state have been
        REASSIGNED since the last call (direct assignment is a supported
        pattern — tests and the dryrun use it — and must not silently serve
        stale cached weights)."""
        if self._encode_step is None:
            nd = self.config.runtime.n_devices
            self._encode_pad = nd or 1
            self._encode_in_sharding = None
            if nd:
                from satae.parallel import batch_sharding
                from satae.parallel.dp import make_dp_encode_step
                mesh = self._infer_mesh()
                self._encode_step = make_dp_encode_step(
                    mesh, self.config.model, self.config.compute_dtype,
                    axis=self.config.runtime.mesh_axis)
                self._encode_in_sharding = batch_sharding(
                    mesh, 4, axis=self.config.runtime.mesh_axis)
            elif self._use_pallas():
                from satae.data.augment import normalize
                from satae.models.fast_infer import encoder_infer_pallas

                cfg = self.config.model
                self._encode_step = jax.jit(
                    lambda p, s, u8: encoder_infer_pallas(
                        p, s, normalize(u8, self.config.compute_dtype), cfg))
            else:
                self._encode_step = make_encode_step(self.config.model,
                                                     self.config.compute_dtype)
        if self._predict_step is None:
            if self._use_pallas():
                from satae.models.fast_infer import mlp_infer_pallas

                cfg = self.config.model
                self._predict_step = jax.jit(
                    lambda p, s, x: jnp.argmax(
                        mlp_infer_pallas(p, s, x, cfg), axis=-1))
                self._proba_step = jax.jit(
                    lambda p, s, x: jax.nn.softmax(
                        mlp_infer_pallas(p, s, x, cfg), axis=-1))
            else:
                self._predict_step = S.make_mlp_predict(self.config.model)
                self._proba_step = S.make_mlp_proba(self.config.model)
        if self._decode_step is None:
            # decoder serving (reconstruct/decode). Always the XLA path —
            # there is no Pallas decoder (the im2col conv penalty that rules
            # Pallas out for the encoder, docs/PERF.md, applies doubly to
            # the transposed convs)
            if self.config.runtime.n_devices:
                from satae.parallel.dp import make_dp_decode_step
                self._decode_step = make_dp_decode_step(
                    self._infer_mesh(), self.config.model,
                    self.config.compute_dtype,
                    axis=self.config.runtime.mesh_axis,
                    image_size=self.config.data.image_size)
            else:
                from satae.train.extract import make_decode_step
                self._decode_step = make_decode_step(
                    self.config.model, self.config.compute_dtype,
                    image_size=self.config.data.image_size)
        # strong refs + identity comparison: holding the source trees keeps
        # them alive, so `is` can never false-match a recycled id() of a
        # freed tree (only the CURRENT trees are retained — refresh swaps
        # the refs, releasing the previous generation)
        src = getattr(self, "_enc_infer_src", (None, None))
        if self.ae_params is not src[0] or self.ae_bn_state is not src[1]:
            self._enc_infer_args = self._infer_trees(
                self.ae_params["encoder"], self.ae_bn_state["encoder"])
            self._dec_infer_args = self._infer_trees(
                self.ae_params["decoder"], self.ae_bn_state["decoder"])
            self._enc_infer_src = (self.ae_params, self.ae_bn_state)

    def encode(self, images: np.ndarray) -> np.ndarray:
        """uint8 images or floats in [0,1], (N,H,W,C) -> (N, latent_dim).

        With ``RuntimeConfig.n_devices`` set, the encoder forward is
        batch-sharded over the device mesh (inputs padded to a device
        multiple, numerics-identical — the same DP path fit() extraction
        uses); the mesh takes precedence over the Pallas kernels.

        Routed through the fixed-chunk bulk program (:meth:`encode_batched`):
        serving varying N compiles at most two shapes per step, never one per
        input size (a 20-60 s relay compile each on this hardware)."""
        return self.encode_batched(images)

    def predict(self, images: np.ndarray) -> np.ndarray:
        """Images -> predicted class ids, through encoder + MLP.

        Fixed-chunk program (see :meth:`encode`): identical numerics to the
        bulk path — padding rows never interact (eval-mode BN uses running
        stats; convs/linears are per-image)."""
        return self.predict_batched(images)

    def predict_proba(self, images: np.ndarray) -> np.ndarray:
        """Images -> per-class probabilities (softmax over the MLP logits),
        (N, num_classes) float32. The serving confidence surface — no
        reference counterpart (the notebook only argmaxes,
        Report.md:3179-3184). Fixed-chunk program (see :meth:`encode`)."""
        return self.predict_proba_batched(images)

    def _serve_chunk(self, n: int) -> int:
        """Fixed serving chunk size (two-shapes-max discipline): inputs at or
        below one training batch pad to the small bucket (single dispatch),
        everything larger pads to the bulk chunk. Every serving entry point
        therefore compiles at most two programs per jit step for ANY sequence
        of input sizes — previously plain encode/predict/reconstruct padded
        only to the device multiple and paid one XLA compile per distinct
        input size (a 20-60 s relay stall each)."""
        bs = self.config.data.batch_size
        small = -(-bs // self._encode_pad) * self._encode_pad
        if n <= small:
            return small
        return -(-bs * 8 // self._encode_pad) * self._encode_pad

    def _serve_batched(self, images: np.ndarray, head) -> list:
        """Shared bulk-serving executor: ONE host->device upload, fixed-size
        on-device chunks (every call compiles exactly one chunk shape
        regardless of input size — two-shapes-max discipline,
        satae/train/steps.py), latents chained into ``head`` on device.
        Returns per-chunk device arrays covering n+pad rows. Per-chunk host
        round trips are the measured dominant cost on the TPU relay
        (docs/PERF.md, 'uploads are as expensive as readbacks')."""
        imgs = self._to_uint8(np.asarray(images))
        n = len(imgs)
        self._ensure_infer_steps()
        chunk = self._serve_chunk(n)
        pad = (-n) % chunk
        if pad:
            imgs = np.concatenate(
                [imgs, np.zeros((pad,) + imgs.shape[1:], imgs.dtype)])
        imgs_dev = jax.device_put(imgs, self._encode_in_sharding)
        out = []
        for lo in range(0, n + pad, chunk):
            part = imgs_dev[lo:lo + chunk]
            if self._encode_in_sharding is not None:
                # slicing a sharded array drops the batch-axis sharding; put
                # it back with a device-side reshard (no host round trip)
                part = jax.device_put(part, self._encode_in_sharding)
            z = self._encode_step(*self._enc_infer_args, part)
            # match predict(): the MLP runs on f32 latents (master params)
            out.append(head(z.astype(jnp.float32)))
        return out

    def predict_batched(self, images: np.ndarray) -> np.ndarray:
        """predict() over an arbitrarily sized image array via the bulk
        serving path (:meth:`_serve_batched`); one prediction readback."""
        self._require_fitted(mlp=True)
        n = len(np.asarray(images))
        if n == 0:
            return np.zeros((0,), np.int32)
        preds = self._serve_batched(
            images, lambda z: self._predict_step(self.mlp_params,
                                                 self.mlp_bn_state, z))
        return np.asarray(jnp.concatenate(preds))[:n]

    def predict_proba_batched(self, images: np.ndarray) -> np.ndarray:
        """predict_proba() over an arbitrarily sized image array via the
        bulk serving path; one probability readback."""
        self._require_fitted(mlp=True)
        n = len(np.asarray(images))
        if n == 0:
            return np.zeros((0, self.config.model.num_classes), np.float32)
        probs = self._serve_batched(
            images, lambda z: self._proba_step(self.mlp_params,
                                               self.mlp_bn_state, z))
        return np.asarray(jnp.concatenate(probs))[:n]

    def encode_batched(self, images: np.ndarray) -> np.ndarray:
        """encode() over an arbitrarily sized image array via the bulk
        serving path (one upload, fixed-shape chunks — no per-input-size
        recompiles); one latent readback."""
        self._require_fitted()
        n = len(np.asarray(images))
        if n == 0:
            return np.zeros((0, self.config.model.latent_dim), np.float32)
        zs = self._serve_batched(images, lambda z: z)
        return np.asarray(jnp.concatenate(zs))[:n]

    def decode(self, latents: np.ndarray) -> np.ndarray:
        """Latents (N, latent_dim) -> reconstructed images (N, H, W, C)
        float32 in [0,1] (the decoder ends in a sigmoid, Report.md:382-385).
        The inverse of :meth:`encode`; mesh-sharded under
        ``RuntimeConfig.n_devices`` like the encoder path."""
        self._require_fitted()
        self._ensure_infer_steps()
        z = np.asarray(latents, np.float32)
        ld = self.config.model.latent_dim
        if z.ndim != 2 or z.shape[1] != ld:
            raise ValueError(
                f"latents must be (N, {ld}), got {z.shape}")
        n = len(z)
        sz = self.config.data.image_size
        ch = self.config.data.channels
        if n == 0:
            return np.zeros((0, sz, sz, ch), np.float32)
        # fixed-chunk discipline like _serve_batched: one upload, at most two
        # compiled shapes for any sequence of input sizes
        chunk = self._serve_chunk(n)
        pad = (-n) % chunk
        if pad:
            z = np.concatenate([z, np.zeros((pad, ld), np.float32)])
        z_dev = jax.device_put(z)
        outs = [self._decode_step(*self._dec_infer_args,
                                  z_dev[lo:lo + chunk])
                for lo in range(0, n + pad, chunk)]
        return np.asarray(jnp.concatenate(outs), np.float32)[:n]

    def reconstruct(self, images: np.ndarray) -> np.ndarray:
        """Images -> autoencoder reconstructions ``x_hat``, float32 in [0,1].

        The reference model's first forward output (``forward(x)`` returns
        ``(x_hat, logits, z)``, Report.md:429-433) as a serving surface:
        encoder and decoder run eval-mode on device with no host round-trip
        for the latents in between. Accepts uint8 or [0,1] floats like
        :meth:`encode`. Fixed-chunk program (see :meth:`encode`)."""
        return self.reconstruct_batched(images)

    def reconstruct_batched(self, images: np.ndarray) -> np.ndarray:
        """reconstruct() over an arbitrarily sized image array via the bulk
        serving path (one upload, fixed-shape chunks, one readback)."""
        self._require_fitted()
        n = len(np.asarray(images))
        if n == 0:
            sz = self.config.data.image_size
            return np.zeros((0, sz, sz, self.config.data.channels),
                            np.float32)
        outs = self._serve_batched(
            images, lambda z: self._decode_step(*self._dec_infer_args, z))
        return np.asarray(jnp.concatenate(outs))[:n]

    def evaluate(self, ds: ArrayDataset) -> Dict[str, Any]:
        """Confusion matrix + per-class metrics over a split (reference C23).
        """
        preds = self.predict_batched(ds.images)
        cm = M.confusion_matrix(ds.labels, preds, self.config.model.num_classes)
        out = M.per_class_metrics(cm)
        out["confusion_matrix"] = cm
        out["report"] = M.classification_report(
            ds.labels, preds, self.config.model.num_classes,
            target_names=self.classes, cm=cm)
        return out

    # -- persistence -------------------------------------------------------

    def save(self, out_dir: str) -> None:
        """Persist the loaded models as msgpack checkpoints. AE-only
        pipelines (load_ae / AE-only load_torch) save just the autoencoder
        — the native-format conversion leg of the migration flows; reload
        with :meth:`load_ae` (full :meth:`load` requires both files).

        Saving weights that did NOT come from this dir also removes the
        dir's ``*.json`` selection-meta sidecars: those describe the
        PREVIOUS weights' sweep metrics, and leaving them would both
        mislabel the new checkpoints and let a stale metric compete in a
        later sweep's resume protection (SweepBook)."""
        self._require_fitted()
        out = Path(out_dir)
        same_src = (getattr(self, "_ae_src_dir", None)
                    == str(out.resolve()))
        save_model(out / "ae_global_best.msgpack", self.ae_params,
                   self.ae_bn_state)
        if not same_src:
            (out / "ae_global_best.json").unlink(missing_ok=True)
        if self.mlp_params is not None:
            save_model(out / "mlp_global_best.msgpack",
                       self.mlp_params, self.mlp_bn_state)
            if not same_src:
                (out / "mlp_global_best.json").unlink(missing_ok=True)
        if self.classes:
            (out / "classes.json").write_text(
                json.dumps(list(self.classes)))

    def load_ae(self, out_dir: str) -> "SatAEPipeline":
        """Load ONLY the autoencoder checkpoint from a run dir — for
        ``fit(reuse_ae=True)`` flows where no MLP has been trained yet
        (the reference's phase-2 restart, Report.md:2590-2595)."""
        ae_file = Path(out_dir) / "ae_global_best.msgpack"
        if not ae_file.exists():
            raise FileNotFoundError(f"no AE checkpoint at {ae_file}")
        cfg = self.config
        ae_p, ae_s = supervised_ae_init(jax.random.PRNGKey(0), cfg.model,
                                        in_ch=cfg.data.channels,
                                        image_size=cfg.data.image_size)
        self.ae_params, self.ae_bn_state = load_model(ae_file, ae_p, ae_s)
        self._ae_src_dir = str(Path(out_dir).resolve())
        classes_file = Path(out_dir) / "classes.json"
        if classes_file.exists():
            self.classes = tuple(json.loads(classes_file.read_text()))
        self._encode_step = None
        self._decode_step = None
        return self

    def load(self, out_dir: str) -> "SatAEPipeline":
        """Load a full run dir (AE + MLP); delegates the AE leg (template
        init, checkpoint restore, provenance stamp, classes.json) to
        :meth:`load_ae` so the two stay in lockstep."""
        ae_file = Path(out_dir) / "ae_global_best.msgpack"
        mlp_file = Path(out_dir) / "mlp_global_best.msgpack"
        missing = [str(p) for p in (ae_file, mlp_file) if not p.exists()]
        if missing:
            raise FileNotFoundError(
                f"no fitted pipeline under {out_dir!r} (missing: "
                f"{', '.join(missing)}) — run fit(out_dir=...) or "
                "`python -m satae.cli fit --out ...` first")
        self.load_ae(out_dir)
        mlp_p, mlp_s = mlp_init(jax.random.PRNGKey(0), self.config.model)
        self.mlp_params, self.mlp_bn_state = load_model(mlp_file,
                                                        mlp_p, mlp_s)
        self._predict_step = None
        self._proba_step = None
        return self

    def export_torch(self, dest_dir: str) -> None:
        """Write the fitted models as reference-format ``.pt`` state_dicts —
        ``AE_GLOBAL_BEST.pt`` + ``MLP_GLOBAL_BEST.pt``, the exact files the
        reference notebook saves (Report.md:714-716, 2725) — strict-loadable
        by its torch model classes. AE-only pipelines export just
        ``AE_GLOBAL_BEST.pt`` (the notebook's own mid-pipeline state). See
        satae/io/torch_export.py for the layout conversions."""
        self._require_fitted()
        from satae.io.torch_export import save_torch_mlp, save_torch_sae
        dest = Path(dest_dir)
        dest.mkdir(parents=True, exist_ok=True)
        cfg = self.config
        save_torch_sae(str(dest / "AE_GLOBAL_BEST.pt"), self.ae_params,
                       self.ae_bn_state, cfg.model,
                       image_size=cfg.data.image_size)
        if self.mlp_params is not None:
            save_torch_mlp(str(dest / "MLP_GLOBAL_BEST.pt"), self.mlp_params,
                           self.mlp_bn_state, cfg.model)

    def load_torch(self, ae_pt: str,
                   mlp_pt: Optional[str] = None) -> "SatAEPipeline":
        """Load reference-notebook ``.pt`` checkpoints (Report.md:714-716,
        2725) directly into the pipeline, ready for encode/predict/evaluate.
        The inverse of :meth:`export_torch`. With ``mlp_pt=None`` only the
        autoencoder is loaded — pair with ``fit(reuse_ae=True)`` to train
        the MLP stage in satae on a notebook-trained encoder."""
        from satae.io.torch_import import load_torch_mlp, load_torch_sae
        cfg = self.config
        self.ae_params, self.ae_bn_state = load_torch_sae(
            ae_pt, cfg.model, in_ch=cfg.data.channels,
            image_size=cfg.data.image_size)
        self._ae_src_dir = None  # foreign checkpoint, no run-dir provenance
        if mlp_pt is not None:
            self.mlp_params, self.mlp_bn_state = load_torch_mlp(mlp_pt,
                                                                cfg.model)
        self._encode_step = None
        self._predict_step = None
        self._proba_step = None
        self._decode_step = None
        return self

    def _require_fitted(self, mlp: bool = False) -> None:
        """``mlp=True`` for surfaces that classify: an AE-only pipeline
        (load_ae / load_torch with mlp_pt omitted) supports
        encode/decode/reconstruct but not predict/evaluate/export."""
        if self.ae_params is None:
            raise RuntimeError("pipeline is not fitted — call fit() or load()")
        if mlp and self.mlp_params is None:
            raise RuntimeError(
                "no classifier: only the autoencoder is loaded (load_ae / "
                "AE-only load_torch) — run fit(reuse_ae=True) to train the "
                "MLP stage, or load a full checkpoint")


# -- module-level conveniences ---------------------------------------------

def fit(config: Optional[PipelineConfig] = None, **kwargs) -> SatAEPipeline:
    pipe = SatAEPipeline(config)
    pipe.fit(**kwargs)
    return pipe


def encode(pipe: SatAEPipeline, images: np.ndarray) -> np.ndarray:
    return pipe.encode(images)


def predict(pipe: SatAEPipeline, images: np.ndarray) -> np.ndarray:
    return pipe.predict(images)
