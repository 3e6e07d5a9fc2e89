"""Training/eval/predict loops.

The TPU-native replacement for the reference's Lightning plumbing
(reference: ex_maest.py:72-233, models/module.py:44-349): one jitted
data-parallel step, host-side epoch orchestration, orbax checkpoints
(best-on-val-loss + every-epoch, reference: models/module.py:256-264),
SWA pytree averaging, sklearn macro AP/ROC, TensorBoard scalars.
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..api import get_maest
from ..data import (
    BatchLoader,
    DatasetConfig,
    ExhaustiveMelDataset,
    ExhaustiveMelDatasetTS,
    MelChunkDataset,
    MelChunkDatasetTS,
    class_balanced_weights_streaming,
    device_prefetch,
    load_groundtruth,
    weighted_epoch_indices,
)
from ..models.vit import MAESTNet
from ..parallel.mesh import batch_sharding, make_mesh, replicated, shard_params
from .metrics import macro_ap_roc
from .schedules import make_schedule
from .state import TrainState, make_optimizer, swa_update
from .steps import AugmentConfig, make_eval_step, make_predict_step, make_train_step

_logger = logging.getLogger("maest_tpu.train")


def _augment_config(cfg: dict) -> AugmentConfig:
    dm = cfg["datamodule"]
    return AugmentConfig(
        normalize=dm["norm"]["do"],
        norm_mean=dm["norm"]["norm_mean"],
        norm_std=dm["norm"]["norm_std"],
        masking=dm["masking"]["do"],
        time_mask_param=dm["masking"]["time_mask_param"],
        freq_mask_param=dm["masking"]["freq_mask_param"],
        mask_p=dm["masking"]["p"],
        time_masks=dm["masking"]["time_masks"],
        freq_masks=dm["masking"]["freq_masks"],
        iid_masks=dm["masking"]["iid_masks"],
        mixup_alpha=cfg["module"]["mixup_alpha"],
        roll=dm["roll"]["do"],
        roll_axis=dm["roll"]["axis"],
        roll_shift_range=dm["roll"]["shift_range"],
        roll_shift=dm["roll"]["shift"],
    )


def _build_model(cfg: dict, dtype):
    m = cfg["maest"]
    wrapper = get_maest(
        arch=m["arch"],
        pretrained=m["pretrained"],
        n_classes=m["n_classes"],
        in_channels=m["in_channels"],
        stride_f=m["stride_f"],
        stride_t=m["stride_t"],
        input_f=m["input_f"],
        input_t=m["input_t"],
        u_patchout=m["u_patchout"],
        s_patchout_t=m["s_patchout_t"],
        s_patchout_f=m["s_patchout_f"],
        s_patchout_f_indices=tuple(m["s_patchout_f_indices"]),
        s_patchout_f_interleaved=m["s_patchout_f_interleaved"],
        s_patchout_t_indices=tuple(m["s_patchout_t_indices"]),
        s_patchout_t_interleaved=m["s_patchout_t_interleaved"],
        distilled_type=m["distilled_type"],
        checkpoint=m["checkpoint"],
        checkpoint_swa_weights=m["checkpoint_swa_weights"],
        checkpoint_discard_head=m["checkpoint_discard_head"],
        dtype=dtype,
        seed=cfg.get("seed", 0),
        embed_dim=m.get("embed_dim", 768),
        depth=m.get("depth", 12),
        num_heads=m.get("num_heads", 12),
        remat=m.get("remat", False),
        remat_policy=m.get("remat_policy", "full"),
        attention_quant=m.get("attention_quant", "none"),
        attention_bwd_quant=m.get("attention_bwd_quant", "none"),
    )
    return wrapper


def _dataset_cfg(cfg: dict) -> DatasetConfig:
    ds = cfg["dataset"]
    return DatasetConfig(
        sample_rate=ds["sample_rate"],
        hop_size=ds["hop_size"],
        n_bands=ds["n_bands"],
        clip_length=cfg["datamodule"]["clip_length"],
    )


def swa_epoch_window(swa_epoch_start: int, max_epochs: int,
                     epoch: int) -> bool:
    """Does this END-of-(0-based)-``epoch`` moment fall in Lightning's SWA
    averaging window?

    Lightning's ``StochasticWeightAveraging`` updates the average at the
    START of each 0-based epoch in [swa_epoch_start-1, max_epochs-1]
    (reference: helpers/swa_callback.py + Lightning ``swa_start``) — i.e.
    it snapshots the weights AFTER epochs swa_epoch_start-2..max_epochs-2
    and never the final epoch's. This mirrors that window for an
    end-of-epoch hook, keeping the averaging phase aligned with the SWALR
    LR swap (train/schedules.py::swa_lr_overlay, swap at 0-based
    swa_epoch_start-1). Corner: Lightning's swa_epoch_start<=1 would also
    average the INITIAL weights — unreachable from an end-of-epoch hook
    and outside every shipped recipe (a 1-epoch start<=1 run then
    performs no update, leaving the SWA buffer = the initial copy, which
    IS Lightning's average in that degenerate case).
    """
    return swa_epoch_start - 2 <= epoch <= max_epochs - 2


def _precision_dtype(precision: str):
    return {"bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16,
            "fp32": jnp.float32, "32": jnp.float32,
            "16-mixed": jnp.bfloat16}[str(precision)]


class Trainer:
    """End-to-end pre-training driver (reference `main`, ex_maest.py:72-91)."""

    def __init__(self, cfg: dict, run_dir: Optional[str] = None,
                 run_info: Optional[dict] = None):
        self.cfg = cfg
        self._run_info = run_info
        tr = cfg["trainer"]
        self.dtype = _precision_dtype(tr["precision"])
        pp = int(tr.get("pipeline_parallel") or 0)
        self.pipeline_parallel = pp if pp > 1 else 0
        self.num_microbatches = int(tr.get("num_microbatches") or 4)
        if self.pipeline_parallel:
            if tr.get("sequence_parallel"):
                raise ValueError(
                    "pipeline_parallel does not compose with "
                    "sequence_parallel (SP token-shards the residual stream "
                    "between blocks; the pipeline owns that seam)"
                )
            from ..parallel.pipeline import make_pipeline_mesh

            # model_parallel > 1 composes: Megatron TP inside each pipeline
            # stage over a third 'model' mesh axis (dp x pp x tp)
            self.mesh = make_pipeline_mesh(
                tr["devices"], num_stages=pp,
                model_parallel=tr.get("model_parallel", 1) or 1,
            )
        else:
            self.mesh = make_mesh(tr["devices"], tr.get("model_parallel", 1))
        self.n_data = self.mesh.shape["data"]
        self.teacher_student = cfg["datamodule"]["teacher_student"]["do"]
        self.aug = _augment_config(cfg)

        wrapper = _build_model(cfg, self.dtype)
        self.model_cfg = wrapper.cfg
        if tr.get("sequence_parallel") and self.mesh.shape.get("model", 1) > 1:
            self.model_cfg = self.model_cfg.replace(sequence_parallel=True)
        # Under a multi-device mesh the flash kernel runs inside a shard_map
        # region (GSPMD cannot partition a pallas_call directly); pass the
        # mesh so Attention routes through flash_attention_sharded. The
        # pipeline path does its own shard_map (stage compute is
        # single-device inside it), so the net stays mesh-free there.
        self.net = MAESTNet(
            self.model_cfg, dtype=self.dtype,
            mesh=self.mesh
            if (self.mesh.size > 1 and not self.pipeline_parallel) else None,
        )
        params = wrapper.params

        opt = cfg["module"]["optimizer"]
        epoch_len = cfg["datamodule"]["sampler"]["epoch_len"]
        self.global_batch = cfg["datamodule"]["batch_size_train"] * self.n_data
        self.steps_per_epoch = max(1, epoch_len // self.global_batch)
        if tr["limit_train_batches"]:
            self.steps_per_epoch = min(self.steps_per_epoch, tr["limit_train_batches"])
        accum = int(tr.get("accumulate_grad_batches") or 1)
        # the LR schedule advances per OPTIMIZER step (MultiSteps shows the
        # inner optimizer only completed steps), so keep the epoch-indexed
        # ramp semantics by scaling steps-per-epoch down by the factor;
        # fractional on purpose — flooring would drift the epoch rate when
        # steps_per_epoch is not a multiple of accum
        schedule = make_schedule(
            opt["schedule_mode"], opt["lr"],
            self.steps_per_epoch / accum if accum > 1 else self.steps_per_epoch,
            warm_up_len=opt["warm_up_len"],
            ramp_down_start=opt["ramp_down_start"],
            ramp_down_len=opt["ramp_down_len"],
            last_lr_value=opt["last_lr_value"],
            # Lightning SWA replaces the scheduler with SWALR from the SWA
            # swap epoch (reference: models/module.py:268-273 swa_lrs=2e-5);
            # without this the rampdown keeps going — a ~100x LR divergence
            # over the back half of a 130-epoch pretrain.
            do_swa=cfg["module"]["do_swa"],
            swa_epoch_start=cfg["module"]["swa_epoch_start"],
            swa_lr=cfg["module"]["swa_lrs"],
        )
        self.tx = make_optimizer(
            lr_schedule=schedule, adamw=opt["adamw"],
            weight_decay=opt["weight_decay"],
            accumulate_steps=accum,
        )

        self.fsdp = bool(tr.get("fsdp")) and self.n_data > 1
        with self.mesh:
            if self.pipeline_parallel:
                # stage params are selected inside the pipeline shard_map;
                # storage keeps the checkpoint-mappable layout — replicated,
                # or ZeRO-3 data-sharded under fsdp (TP sharding, if any,
                # happens inside the trunk's shard_map, not at rest)
                if self.fsdp:
                    params = shard_params(params, self.mesh, fsdp=True,
                                          tensor_parallel=False)
                else:
                    params = jax.device_put(params, replicated(self.mesh))
            else:
                params = shard_params(params, self.mesh, fsdp=self.fsdp)
            self.state = TrainState.create(
                params, self.tx, with_swa=cfg["module"]["do_swa"]
            )
            # scalars/opt counters must live on the mesh, not device 0
            from ..parallel.mesh import ensure_on_mesh

            self.state = ensure_on_mesh(self.state, self.mesh)
        if self.pipeline_parallel:
            from ..parallel.pipeline import (
                make_pipeline_train_step,
                pipeline_apply,
            )

            if self.global_batch % (self.n_data * self.num_microbatches):
                raise ValueError(
                    f"global train batch {self.global_batch} must divide by "
                    f"data shards x num_microbatches = "
                    f"{self.n_data} x {self.num_microbatches}"
                )
            self.train_step = make_pipeline_train_step(
                self.net, self.tx, self.aug, mesh=self.mesh,
                num_microbatches=self.num_microbatches,
                teacher_student=self.teacher_student,
                fsdp=self.fsdp,
            )
            # eval streams one microbatch per stage (m=1): _pad_batches only
            # guarantees divisibility by the data-axis size
            eval_apply = lambda params, x: pipeline_apply(  # noqa: E731
                self.net, params, x, self.mesh, num_microbatches=1,
                train=False, fsdp=self.fsdp,
            )
        else:
            self.train_step = make_train_step(
                self.net, self.tx, self.aug,
                teacher_student=self.teacher_student,
            )
            eval_apply = None
        self.eval_step = make_eval_step(
            self.net, self.aug,
            with_swa=cfg["module"]["do_swa"], apply_fn=eval_apply,
            # multi-process: replicate outputs so each host can fetch the
            # full logits (single-process keeps the sharded fast path)
            out_sharding=(replicated(self.mesh)
                          if jax.process_count() > 1 else None),
        )
        self.batch_shard = batch_sharding(self.mesh)

        # Multi-process runs (the reference's multi-node DDP,
        # ex_maest519.sh:1-23): every process must derive the SAME run dir —
        # checkpoint saves are collective and take their path from it, so a
        # timestamp straddling a second boundary would wedge the orbax
        # commit across divergent directories. Broadcast proc 0's FORMATTED
        # name as bytes: a float64 stamp would be silently canonicalized to
        # float32 (x64 off; 128 s ULP at 2026 epoch values — colliding /
        # minute-wrong dirs), and formatting after the broadcast would still
        # diverge across hosts with different TZ settings.
        self.proc0 = jax.process_index() == 0
        stamp = time.strftime("%y%m%d-%H%M%S")  # fixed 13 chars
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            stamp = bytes(
                multihost_utils.broadcast_one_to_all(
                    np.frombuffer(stamp.encode("ascii"), np.uint8)
                )
            ).decode("ascii")
        self.run_dir = Path(run_dir or tr["default_root_dir"]) / stamp
        self.run_dir.mkdir(parents=True, exist_ok=True)
        # host-side run records are proc-0-only (the reference's Sacred
        # observer and TensorBoard logger live on rank 0 the same way)
        from ..utils.run_record import MetricsLog, write_run_json

        if self.proc0:
            (self.run_dir / "config.json").write_text(
                json.dumps(cfg, indent=2, default=str)
            )
            write_run_json(self.run_dir, cfg, self._run_info)
        self.metrics_log = MetricsLog(self.run_dir / "metrics.jsonl",
                                      enabled=self.proc0)
        self._tb = None
        self.epoch = 0
        self.best_val = float("inf")  # persisted in ckpt meta (resume-safe)

    # -- logging -----------------------------------------------------------
    @property
    def tb(self):
        if self._tb is None:
            if not self.proc0:
                # rank>0 writes would shard the event stream across
                # duplicate writers (reference: rank-0 TensorBoardLogger)
                self._tb = _NullWriter()
                return self._tb
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(str(self.run_dir / "tb"))
            except Exception:  # tensorboard optional
                self._tb = _NullWriter()
        return self._tb

    # -- data ---------------------------------------------------------------
    def _train_dataset(self):
        dm = self.cfg["datamodule"]
        ds_cfg = _dataset_cfg(self.cfg)
        if self.teacher_student:
            return MelChunkDatasetTS(
                dm["groundtruth_train"], dm["base_dir"], ds_cfg,
                teacher_target_base_dir=dm["teacher_student"]["teacher_target_base_dir"],
                teacher_target_threshold=dm["teacher_student"]["teacher_target_threshold"],
            )
        return MelChunkDataset(dm["groundtruth_train"], dm["base_dir"], ds_cfg)

    def _val_dataset(self):
        # cached: the dataset (and its groundtruth unpickle — hundreds of
        # MB at Discogs scale) is identical every epoch
        if getattr(self, "_val_ds", None) is None:
            self._val_ds = self._build_val_dataset()
        return self._val_ds

    def _build_val_dataset(self):
        dm = self.cfg["datamodule"]
        base = dm["base_dir_val"] or dm["base_dir"]
        # crop_seed pins the val crops: deterministic per item, so every
        # process of a multi-host run loads byte-identical eval batches
        # (they are fed replicated, and jax.device_put asserts cross-process
        # agreement) — and val metrics compare across epochs on fixed crops
        crop_seed = self.cfg.get("seed", 0)
        if self.teacher_student:
            # TS eval logs standard/teacher/combined losses, so the val
            # loader also carries teacher targets (reference:
            # models/module.py:318-349)
            return MelChunkDatasetTS(
                dm["groundtruth_val"], base, _dataset_cfg(self.cfg),
                teacher_target_base_dir=dm["teacher_student"]["teacher_target_base_dir"],
                teacher_target_threshold=dm["teacher_student"]["teacher_target_threshold"],
                crop_seed=crop_seed,
            )
        return MelChunkDataset(dm["groundtruth_val"], base,
                               _dataset_cfg(self.cfg), crop_seed=crop_seed)

    def _epoch_indices(self, dataset, epoch: int) -> np.ndarray:
        dm = self.cfg["datamodule"]
        s = dm["sampler"]
        # the targets matrix and class weights are epoch-invariant; at
        # Discogs scale rebuilding the N x 400 matrix every epoch is
        # minutes of pure host stall per epoch on this 1-core machine
        if getattr(self, "_weights_for", None) is not dataset:
            # streamed: never materialises the dense (N, 400) matrix — at
            # Discogs scale that transient is GBs of host RAM (measured in
            # docs/DESIGN.md round-5 dress rehearsal)
            self._sample_weights = class_balanced_weights_streaming(
                dataset.groundtruth, dataset.filenames,
                s["sample_weight_offset"], s["sample_weight_sum"]
            )
            self._weights_for = dataset
        weights = self._sample_weights
        return weighted_epoch_indices(
            weights,
            min(s["epoch_len"], self.steps_per_epoch * self.global_batch),
            seed=self.cfg.get("seed", 0),
            epoch=epoch,
            replacement=s["sampler_replace"],
            rank=jax.process_index(),
            num_replicas=jax.process_count(),
        )

    # -- checkpointing -------------------------------------------------------
    def _checkpointer(self):
        """Long-lived async checkpointer (orbax StandardCheckpointer is an
        AsyncCheckpointer: ``save`` snapshots to host and commits in the
        background, so the epoch's save overlaps the next epoch's
        compute)."""
        if getattr(self, "_ckptr", None) is None:
            import orbax.checkpoint as ocp

            self._ckptr = ocp.StandardCheckpointer()
        return self._ckptr

    def finalize_checkpoints(self):
        """Block until every async save has committed."""
        if getattr(self, "_ckptr", None) is not None:
            self._ckptr.wait_until_finished()

    def save_checkpoint(self, tag: str):
        path = (self.run_dir / "checkpoints" / tag).absolute()
        ckptr = self._checkpointer()
        # one save in flight at a time: commit the previous one first
        ckptr.wait_until_finished()
        ckptr.save(path, dict(
            params=self.state.params,
            opt_state=self.state.opt_state,
            swa_params=self.state.swa_params,
            swa_n=self.state.swa_n,
            step=self.state.step,
        ), force=True)
        # the meta marker can be written before the async commit finishes:
        # orbax materialises the checkpoint under
        # <tag>.orbax-checkpoint-tmp and atomically renames it to <tag> on
        # commit, so latest_checkpoint (which requires BOTH the clean
        # directory name and the marker) never sees a half-written save —
        # and a fully committed save is usable immediately even if the
        # process is later SIGKILLed before any finalize runs
        # atomic (tmp + rename): a SIGKILL between truncate and write must
        # not leave a corrupt marker that crashes elastic recovery's
        # latest_checkpoint scan forever
        # marker written once (proc 0): the orbax save above is collective —
        # every process participates — but the host-side marker must not be
        # raced by N writers on a shared filesystem
        if self.proc0:
            meta = self.run_dir / "checkpoints" / f"{tag}.meta.json"
            tmp = meta.with_suffix(".json.tmp")
            tmp.write_text(json.dumps({
                "epoch": self.epoch,
                # json has no inf: None = "no best yet"
                "best_val": (self.best_val
                             if self.best_val != float("inf") else None),
            }))
            tmp.replace(meta)

    def restore_checkpoint(self, path: str):
        import orbax.checkpoint as ocp

        self.finalize_checkpoints()
        target = dict(
            params=self.state.params,
            opt_state=self.state.opt_state,
            swa_params=self.state.swa_params,
            swa_n=self.state.swa_n,
            step=self.state.step,
        )
        with ocp.StandardCheckpointer() as ckptr:
            try:
                restored = ckptr.restore(Path(path).absolute(), target)
            except Exception as restore_err:
                # SWA-structure mismatch between this run and the ckpt:
                # `test` forces do_swa=False (reference ex_maest.py:99) on
                # checkpoints saved by SWA training runs, and an SWA run
                # may resume a no-SWA checkpoint. Retry with the opposite
                # swa target, then coerce to this run's setting (a fresh
                # window when this run wants SWA and the ckpt has none —
                # swa_n is restored, so a restored window stays intact).
                # Probe the saved structure first: for any OTHER restore
                # failure (corrupt ckpt, optimizer mismatch) the original
                # error must surface, not a confusing alt-target one.
                want_swa = bool(self.state.swa_params)
                try:
                    saved = ckptr.metadata(
                        Path(path).absolute()).item_metadata.tree
                    ckpt_has_swa = bool(saved.get("swa_params"))
                except Exception:
                    raise restore_err
                if ckpt_has_swa == want_swa:
                    raise restore_err  # not an SWA mismatch
                alt = dict(target)
                alt["swa_params"] = (
                    {} if want_swa else
                    jax.tree.map(lambda x: jnp.array(x, copy=True),
                                 self.state.params))
                restored = ckptr.restore(Path(path).absolute(), alt)
                if want_swa:
                    restored["swa_params"] = jax.tree.map(
                        lambda x: jnp.array(x, copy=True),
                        restored["params"])
                else:
                    # discard the ckpt's SWA entirely: a nonzero swa_n
                    # next to an empty buffer would corrupt a later
                    # SWA resume of a checkpoint saved from this state
                    restored["swa_params"] = {}
                    restored["swa_n"] = jnp.zeros_like(restored["swa_n"])
        self.state = TrainState(
            step=restored["step"],
            params=restored["params"],
            opt_state=restored["opt_state"],
            swa_params=restored["swa_params"],
            swa_n=restored["swa_n"],
        )
        meta = Path(path).parent / (Path(path).name + ".meta.json")
        if meta.exists():
            # checkpoints are written AFTER an epoch completes, so resume
            # at the next one (Lightning resume semantics) — re-running the
            # saved epoch would double its optimizer updates and push the
            # step-indexed LR schedule past its planned range
            m = json.loads(meta.read_text())
            self.epoch = m.get("epoch", -1) + 1
            # restore the best-so-far val loss: without it every resumed
            # run's first epoch would clobber the 'best' checkpoint
            bv = m.get("best_val")
            self.best_val = float(bv) if bv is not None else float("inf")

    # -- loops ---------------------------------------------------------------
    def fit(self):
        from ..utils.run_record import finalize_run_json

        def _finalize(status, result=None):
            if self.proc0:  # run.json is a proc-0 record (see __init__)
                finalize_run_json(self.run_dir, status, result)

        try:
            result = self._fit()
        except BaseException as e:
            # SystemExit from a SIGTERM preemption handler and Ctrl-C are
            # stops, not crashes; a sys.exit(1)-style failure exit or any
            # Exception is FAILED — without this clause run.json stays
            # RUNNING after the process is gone (see classify_exit)
            from ..utils.run_record import classify_exit
            _finalize(classify_exit(e))
            raise
        finally:
            self.metrics_log.close()  # log() reopens lazily if fit is re-run
        _finalize("COMPLETED", result)
        return result

    def _fit(self):
        cfg = self.cfg
        tr = cfg["trainer"]
        mod = cfg["module"]
        if cfg.get("ckpt_path"):
            self.restore_checkpoint(cfg["ckpt_path"])
            _logger.info("resumed from %s at epoch %d", cfg["ckpt_path"], self.epoch)

        train_ds = self._train_dataset()
        # each host loads only ITS rows of the global batch (the sampler
        # hands it a 1/P slice of the index space); device_prefetch
        # assembles the global array from the per-process shards, keeping
        # steps-per-epoch equal to the single-host schedule
        n_proc = jax.process_count()
        if self.global_batch % n_proc:
            raise ValueError(
                f"global batch {self.global_batch} not divisible by "
                f"{n_proc} processes"
            )
        loader = BatchLoader(
            train_ds, self.global_batch // n_proc,
            num_workers=cfg["datamodule"]["num_workers"], drop_last=True,
        )
        rng = jax.random.PRNGKey(cfg.get("seed", 0))

        with self.mesh:
            while self.epoch < tr["max_epochs"]:
                t0 = time.time()
                idx = self._epoch_indices(train_ds, self.epoch)
                n_steps = 0
                last = {}
                for batch in device_prefetch(
                    loader.iter_indices(idx), self.batch_shard,
                    process_local=True,
                ):
                    # per-step randomness comes from fold_in(rng, state.step)
                    # inside the jitted step; no host-side split per step
                    self.state, metrics = self.train_step(
                        self.state, _step_batch(batch), rng
                    )
                    n_steps += 1
                    if n_steps % tr["log_every_n_steps"] == 0:
                        last = {k: float(v) for k, v in metrics.items()}
                        step = int(self.state.step)
                        for k, v in last.items():
                            self.tb.add_scalar(k, v, step)
                            self.metrics_log.log(k, v, step)
                    if tr["limit_train_batches"] and n_steps >= tr["limit_train_batches"]:
                        break
                # SWA (reference: helpers/swa_callback.py:9-15; start epoch
                # models/module.py:25)
                if mod["do_swa"] and swa_epoch_window(
                        mod["swa_epoch_start"], tr["max_epochs"], self.epoch):
                    self.state = swa_update(self.state)

                val = self.validate()
                dt = time.time() - t0
                _logger.info(
                    "epoch %d: %d steps in %.1fs train=%s val=%s",
                    self.epoch, n_steps, dt, last, val,
                )
                for k, v in val.items():
                    self.tb.add_scalar(k, v, self.epoch)
                    self.metrics_log.log(k, v, self.epoch)

                # update best_val BEFORE the epoch save so its meta marker
                # carries the current best; a resumed run then restores it
                # instead of resetting to inf and clobbering the true best
                # checkpoint with the first post-resume epoch
                improved = val.get("val_loss", float("inf")) < self.best_val
                if improved:
                    self.best_val = float(val["val_loss"])
                self.save_checkpoint(f"epoch-{self.epoch}")
                if improved:
                    self.save_checkpoint("best")
                self.epoch += 1
        self.finalize_checkpoints()
        return {"done": True}

    def _run_eval(self, dataset, stage: str) -> dict:
        cfg = self.cfg
        tr = cfg["trainer"]
        dm = cfg["datamodule"]
        n_proc = jax.process_count()
        # Rank-sharded eval loading (reference: discogs/datamodule.py:79-97
        # DistributedSamplerWrapper on the val/test loaders): each host
        # reads only 1/P of the mel windows. Requires the mesh data axis to
        # span processes evenly (pure DP/FSDP); model-parallel-heavy meshes
        # (data axis not divisible by P) fall back to replicated loading.
        sharded = (n_proc > 1 and self.n_data % n_proc == 0
                   and hasattr(dataset, "targets_for"))
        if sharded:
            batches = self._rank_sharded_eval_batches(dataset)
            prefetch_kw = {"process_local": True}
        else:
            if n_proc > 1:
                _logger.warning(
                    "multi-process eval: data axis %d not divisible by %d "
                    "processes — every host loads the full eval set",
                    self.n_data, n_proc)
            loader = BatchLoader(
                dataset, dm["batch_size_test"],
                num_workers=dm["num_workers"],
            )
            batches = _pad_batches(iter(loader), self.n_data,
                                   dm["batch_size_test"])
            prefetch_kw = {}
        ys, yts, outs, n = [], [], {}, 0
        # only x is prefetched to device: the eval consumes y/y_teacher on
        # HOST (losses recomputed from gathered logits below) — device_put
        # + np.asarray would round-trip the targets over the ~50 MB/s relay
        for batch in device_prefetch(batches, self.batch_shard, keys=("x",),
                                     **prefetch_kw):
            n_true = batch["_n"]
            res = self.eval_step(self.state, batch["x"])
            ys.append(np.asarray(batch["y"], np.float32)[:n_true])
            if "y_teacher" in batch:
                yts.append(np.asarray(batch["y_teacher"], np.float32)[:n_true])
            for name, logits in res.items():
                outs.setdefault(name, []).append(
                    np.asarray(logits, np.float32)[:n_true]
                )
            n += 1
            # limit_val_batches must NOT truncate the final test metrics
            # (Lightning keeps a separate limit_test_batches, full by
            # default) — a cheap mid-training val limit would silently
            # publish prefix-only test_ap/test_roc otherwise
            limit = (tr["limit_val_batches"] if stage == "val"
                     else tr.get("limit_test_batches"))
            if limit and n >= limit:
                break
        if not ys:
            return {}

        def bce(z, t):
            # BCE with logits, numerically stable — matches reference
            # BCEWithLogitsLoss exactly even in saturated regimes
            # (reference: models/module.py:90).
            return float(np.mean(
                np.maximum(z, 0) - z * t + np.log1p(np.exp(-np.abs(z)))
            ))

        # No host-side gather here: every process holds the COMPLETE eval
        # outputs by construction — eval_step's out_shardings=replicated is
        # the all_gather (on-device, over ICI), so every host fetches the
        # full logits even when the LOADING was rank-sharded; targets come
        # from groundtruth metadata for the whole batch on every host
        # (targets_for). Allgathering again would just feed nproc duplicate
        # copies of every row into sklearn (reference's rank-sharded DDP
        # eval gathers host-side instead: models/module.py:163-180; the
        # cross-process gather utility itself is scenario-tested in
        # multiproc_worker). Metrics are therefore bit-identical on every
        # host — required, since best-val checkpoint saves are collective.
        y = np.concatenate(ys)
        y_teacher = np.concatenate(yts) if yts else None
        metrics = {}
        for name, chunks in outs.items():
            suffix = f"_{name}" if name else ""
            z = np.concatenate(chunks)
            loss = bce(z, y)
            if y_teacher is not None:
                # teacher-student eval: standard/teacher/combined losses,
                # BOTH from the first-head logits — faithful to the
                # reference eval, which (unlike its train step) scores the
                # teacher targets against logits, not the dist head
                # (reference: models/module.py:326-331).
                loss_teacher = bce(z, y_teacher)
                metrics[f"{stage}_loss_standard{suffix}"] = loss
                metrics[f"{stage}_loss_teacher{suffix}"] = loss_teacher
                loss = (loss + loss_teacher) / 2
            y_hat = 1.0 / (1.0 + np.exp(-z))
            ap, roc = macro_ap_roc(y, y_hat)
            metrics[f"{stage}_loss{suffix}"] = loss
            metrics[f"{stage}_ap{suffix}"] = ap
            metrics[f"{stage}_roc{suffix}"] = roc
        return metrics

    def _rank_sharded_eval_batches(self, dataset):
        """Generator of eval batches where each host loads only ITS
        contiguous 1/P block of every global batch (reference:
        discogs/datamodule.py:79-97 rank-sharded DDP eval).

        ``device_prefetch(process_local=True)`` assembles the global array
        with proc-0 rows first, so host r's local rows are the r-th block
        of the global index window. Targets for the FULL window come from
        ``dataset.targets_for`` (metadata only — no mel IO), keeping every
        host's metric inputs identical.

        Batch composition MIRRORS the replicated path exactly: each global
        batch carries ``batch_size_test`` REAL rows (the same dataset
        prefix per batch, ``_n`` included), padded up to the device-
        divisible T by repeating the window's last real row — so metrics
        are identical between launch topologies even under
        ``limit_val_batches`` (a truncated eval scores the same sample
        prefix either way)."""
        dm = self.cfg["datamodule"]
        n_proc = jax.process_count()
        rank = jax.process_index()
        N = len(dataset)
        B = dm["batch_size_test"]  # real rows per global batch
        T = B + (-B) % self.n_data  # static padded batch, device-divisible
        n_batches = -(-N // B)
        if not n_batches:
            return
        per = T // n_proc  # n_proc | n_data | T (checked by caller)
        windows = []
        for k in range(n_batches):
            real = np.arange(k * B, min((k + 1) * B, N))
            pad = np.full(T - len(real), real[-1])
            windows.append((np.concatenate([real, pad]), len(real)))
        local = np.concatenate([
            w[rank * per:(rank + 1) * per] for w, _ in windows])
        loader = BatchLoader(dataset, per, num_workers=dm["num_workers"])
        for (w, n_true), batch in zip(windows, loader.iter_indices(local)):
            out = {"x": batch["x"]}
            out.update(dataset.targets_for(w))
            out["_n"] = n_true
            yield out

    def validate(self) -> dict:
        return self._run_eval(self._val_dataset(), "val")

    def test(self) -> dict:
        dm = self.cfg["datamodule"]
        if self.teacher_student:
            ds = ExhaustiveMelDatasetTS(
                dm["groundtruth_test"], dm["base_dir"], _dataset_cfg(self.cfg),
                teacher_target_base_dir=dm["teacher_student"]["teacher_target_base_dir"],
                teacher_target_threshold=dm["teacher_student"]["teacher_target_threshold"],
                half_overlapped_inference=self.cfg["dataset"]["half_overlapped_inference"],
            )
        else:
            ds = ExhaustiveMelDataset(
                dm["groundtruth_test"], dm["base_dir"], _dataset_cfg(self.cfg),
                half_overlapped_inference=self.cfg["dataset"]["half_overlapped_inference"],
            )
        return self._run_eval(ds, "test")

    # -- prediction / embedding extraction ------------------------------------
    def predict(self, output_name: str = "embeddings") -> dict:
        """Exhaustive-window prediction, aggregated per file and written as
        .npy (reference: ex_maest.py:162-207)."""
        cfg = self.cfg
        net, mesh, batch_shard = self.net, self.mesh, self.batch_shard
        params = self.state.params
        n_proc = jax.process_count()
        if n_proc > 1:
            # Multi-process extraction (beyond reference — its extract
            # commands are single-GPU, ex_maest.py:162-207): partition by
            # FILE, and run an INDEPENDENT local-mesh program per host so
            # each host may process a different file count without any
            # collective in the loop (a global-mesh program would need
            # every host to issue identical step counts). Each host writes
            # only its own files' .npy outputs — no write races. One
            # up-front collective replicates the (possibly ZeRO-3-sharded)
            # params so a full copy fits each local mesh.
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

            rep = jax.jit(
                lambda t: t, out_shardings=NamedSharding(self.mesh, P())
            )(params)
            host_params = jax.tree.map(
                lambda a: np.asarray(jax.device_get(a)), rep)
            mesh = Mesh(
                np.array(jax.local_devices()).reshape(-1, 1),
                axis_names=("data", "model"))
            net = MAESTNet(self.model_cfg, dtype=self.dtype,
                           mesh=mesh if mesh.size > 1 else None)
            with mesh:
                params = jax.device_put(host_params, replicated(mesh))
            batch_shard = batch_sharding(mesh)
        elif self.pipeline_parallel:
            # Extraction taps intermediate blocks, which the pipeline
            # front/trunk/tail split does not expose — and inference needs no
            # pipeline memory relief. Degrade to the sequential path on a
            # flat DP mesh over the same devices: PP storage keeps the
            # checkpoint-mappable layout (replicated, or ZeRO-3 data-sharded
            # under fsdp), so a resharding device_put is all it takes.
            _logger.info(
                "predict under pipeline_parallel=%d: using the sequential "
                "tap path on a flat %d-way DP mesh",
                self.pipeline_parallel, self.mesh.size,
            )
            mesh = make_mesh(self.mesh.size)
            net = MAESTNet(self.model_cfg, dtype=self.dtype,
                           mesh=mesh if mesh.size > 1 else None)
            params = jax.device_put(params, replicated(mesh))
            batch_shard = batch_sharding(mesh)
        dm = cfg["datamodule"]
        ds_cfg = _dataset_cfg(cfg)
        ds = ExhaustiveMelDataset(
            dm["groundtruth_predict"], dm["base_dir"], ds_cfg,
            half_overlapped_inference=cfg["dataset"]["half_overlapped_inference"],
        )
        loader = BatchLoader(ds, dm["batch_size_test"],
                             num_workers=dm["num_workers"])
        if n_proc > 1:
            # per-FILE stride so every window of a file stays on one host
            # (aggregation and the .npy write are per-file)
            keep = set(ds.filenames[jax.process_index()::n_proc])
            batch_iter = loader.iter_indices(
                [i for i in range(len(ds)) if ds._target_filename(i) in keep])
        else:
            batch_iter = iter(loader)
        predict_step = make_predict_step(net, self.aug)
        block = cfg["predict"]["transformer_block"]

        agg: dict[str, list] = {}
        with mesh:
            batches = _pad_batches(batch_iter, mesh.shape["data"],
                                   dm["batch_size_test"])
            for batch in device_prefetch(batches, batch_shard):
                out = predict_step(params, _step_batch(batch), block)
                n_true = batch["_n"]
                vals = np.asarray(out[output_name], np.float32)[:n_true]
                for fname, v in zip(batch["filename"][:n_true], vals):
                    agg.setdefault(fname, []).append(v)

        out_dir = self._predict_out_dir()
        for fname, vs in agg.items():
            path = out_dir / (fname + f".{output_name}.npy")
            path.parent.mkdir(parents=True, exist_ok=True)
            np.save(path, np.array(vs))
        n_files = len(agg)
        if n_proc > 1:
            # every host reaches this exactly once after its local loop —
            # one symmetric collective to report the GLOBAL file count
            from .metrics import gather_across_hosts

            n_files = int(gather_across_hosts(
                np.array([n_files], np.int64)).sum())
        return {"n_files": n_files, "out_dir": str(out_dir)}

    def _predict_out_dir(self) -> Path:
        """Output dir naming incl. deterministic-patchout tags
        (reference: ex_maest.py:186-201)."""
        cfg = self.cfg
        subdir1 = f"{cfg['datamodule']['clip_length']}sec"
        subdir2 = ""
        for po_dim in ("f", "t"):
            for po_type in ("indices", "interleaved"):
                val = cfg["maest"][f"s_patchout_{po_dim}_{po_type}"]
                if val:
                    tag = "_".join(np.array(val).astype("str")) if np.iterable(val) \
                        else str(val)
                    subdir2 += f"_patchout_{po_dim}_{po_type}" + tag
        subdir3 = str(cfg["predict"]["transformer_block"])
        return Path(cfg["predict"]["out_dir"]) / subdir1 / subdir2 / subdir3


def _step_batch(batch: dict) -> dict:
    return {k: v for k, v in batch.items() if k not in ("filename", "_n")}


def _pad_batches(batches, multiple: int, full_size: int = 0):
    """Pad batches to one static size (padded rows repeat the last sample
    and are sliced off on host via ``_n``).

    With ``full_size`` every batch pads to the same shape so the jitted
    eval/predict step compiles exactly once — a ragged tail batch would
    otherwise trigger a fresh compile (minutes on remote backends). The
    target is also rounded up to a multiple of the data-axis size.
    """
    for batch in batches:
        b = batch["x"].shape[0]
        target = max(full_size, b)
        target += (-target) % multiple
        pad = target - b
        if pad:
            batch = dict(batch)
            for k, v in list(batch.items()):
                if k == "filename":
                    batch[k] = list(v) + [v[-1]] * pad
                else:
                    batch[k] = np.concatenate([v, np.repeat(v[-1:], pad, axis=0)])
        batch["_n"] = b
        yield batch


class _NullWriter:
    def add_scalar(self, *a, **k):
        pass

    def close(self):
        pass


def compute_norm_stats(cfg: dict) -> tuple[float, float]:
    """Dataset mean/std over raw log-mel values (fixes the reference's broken
    ``compute_norm_stats``, ex_maest.py:220-233)."""
    dm = cfg["datamodule"]
    ds = MelChunkDataset(dm["groundtruth_train"], dm["base_dir"], _dataset_cfg(cfg))
    loader = BatchLoader(ds, dm["batch_size_test"], num_workers=dm["num_workers"])
    # streaming global moments: averaging per-batch stds would ignore the
    # between-batch variance of the means (biased low) and over-weight a
    # ragged last batch
    total, total_sq, count = 0.0, 0.0, 0
    for batch in loader:
        x = batch["x"].astype(np.float64)
        total += float(x.sum())
        total_sq += float((x * x).sum())
        count += x.size
    mean = total / count
    var = max(total_sq / count - mean * mean, 0.0)
    return float(mean), float(np.sqrt(var))


def model_speed_test(cfg: dict, batch_size: int = 100, test_length: int = 100
                     ) -> float:
    """AMP train-step throughput in specs/second on a synthetic batch
    (reference: ex_maest.py:108-159). Input geometry follows the model config
    rather than the reference's hardcoded [100, 1, 128, 998]."""
    dtype = _precision_dtype(cfg["trainer"]["precision"])
    wrapper = _build_model(cfg, dtype)
    net = MAESTNet(wrapper.cfg, dtype=dtype)
    tx = make_optimizer(lr_schedule=1e-3, adamw=False)
    aug = _augment_config(cfg)
    step = make_train_step(net, tx, aug)
    # no SWA buffer: the reference speed test carries none either, and the
    # copy would understate the batch-size headroom being measured
    state = TrainState.create(wrapper.params, tx, with_swa=False)

    f, t = wrapper.cfg.img_size
    nc = wrapper.cfg.num_classes
    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.standard_normal((batch_size, f, t), dtype=np.float32)),
        "y": jnp.asarray((rng.random((batch_size, nc)) > 0.9).astype(np.float32)),
    }
    from ..utils.profiling import force

    key = jax.random.PRNGKey(0)  # per-step keys fold in state.step on-device
    for i in range(10):  # warmup
        state, m = step(state, batch, key)
    force(m["train_loss"])  # lazy remote backends need a fetch, not block
    t0 = time.time()
    for i in range(test_length):
        state, m = step(state, batch, key)
    force(m["train_loss"])  # steps chain through `state`, so this forces all
    dt = time.time() - t0
    specs_per_s = test_length * batch_size / dt
    print(f"average speed: {specs_per_s:.1f} specs/second")
    return specs_per_s
