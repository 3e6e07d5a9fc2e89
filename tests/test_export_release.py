"""Training checkpoint -> release artifact bridge (apps/export_release)."""

import pickle

import numpy as np
import pytest

from maest_tpu.apps.ex_maest import run
from maest_tpu.apps.export_release import (
    load_training_checkpoint,
    main,
    select_params,
)

GEOM = ["--n-classes", "8", "--input-t", "62", "--embed-dim", "64",
        "--depth", "2", "--num-heads", "4"]


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    gt = {}
    for i in range(8):
        name = f"clip{i}.mmap"
        rng.standard_normal((100, 96)).astype("float16").tofile(root / name)
        y = (rng.random(8) > 0.6).astype("float16")
        y[i % 8] = 1.0
        gt[name] = y
    for split in ("train", "val"):
        with open(root / f"gt_{split}.pk", "wb") as f:
            pickle.dump(gt, f)
    run(["main", "with",
         f"datamodule.base_dir={root}",
         f"datamodule.groundtruth_train={root}/gt_train.pk",
         f"datamodule.groundtruth_val={root}/gt_val.pk",
         "datamodule.clip_length=1", "datamodule.batch_size_train=2",
         "datamodule.batch_size_test=3", "datamodule.num_workers=2",
         "datamodule.sampler.epoch_len=8", "maest.n_classes=8",
         "maest.input_t=62", "maest.embed_dim=64", "maest.depth=2",
         "maest.num_heads=4", "maest.s_patchout_t=1",
         "trainer.max_epochs=2", "trainer.devices=2",
         "trainer.precision=fp32", "trainer.limit_val_batches=1",
         "module.swa_epoch_start=0", "module.optimizer.warm_up_len=1",
         f"trainer.default_root_dir={root}/exp_logs"])
    runs = sorted((root / "exp_logs").iterdir())
    # epoch-1: swa_params = mean(params@e0, params@e1) != params@e1, so
    # SWA-vs-raw is a value-level difference
    return runs[-1] / "checkpoints" / "epoch-1"


def test_export_torch_roundtrips_through_get_maest(trained_ckpt, tmp_path):
    out = tmp_path / "release.pt"
    assert main([str(trained_ckpt), "--format", "torch", "--out", str(out)]
                + GEOM) == 0
    assert out.exists()

    # the exported SWA weights load back through the public factory and
    # match the checkpoint's swa_params exactly
    from maest_tpu.api import get_maest

    m = get_maest(arch="discogs-maest-30s-pw-129e", pretrained=False,
                  checkpoint=str(out), n_classes=8, input_t=62,
                  embed_dim=64, depth=2, num_heads=4)
    state = load_training_checkpoint(str(trained_ckpt))
    swa, which = select_params(state, swa=True)
    assert which == "swa"
    got = np.asarray(m.params["head_linear"]["kernel"], np.float32)
    want = np.asarray(swa["head_linear"]["kernel"], np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)

    x = np.random.default_rng(1).standard_normal((2, 96, 62)).astype("f4")
    logits = np.asarray(m(x)[0], np.float32)
    assert logits.shape == (2, 8) and np.isfinite(logits).all()


def test_export_raw_params_differ_from_swa(trained_ckpt, tmp_path):
    state = load_training_checkpoint(str(trained_ckpt))
    raw, _ = select_params(state, swa=False)
    swa, _ = select_params(state, swa=True)
    # one SWA update happened (end of epoch 0; the Lightning window
    # excludes the final epoch — train/loop.py::swa_epoch_window): the
    # average must differ from the final raw params by value
    raw_k = np.asarray(raw["blocks_0"]["attn"]["qkv"]["kernel"], np.float32)
    swa_k = np.asarray(swa["blocks_0"]["attn"]["qkv"]["kernel"], np.float32)
    assert not np.allclose(raw_k, swa_k)


def test_export_hf_directory(trained_ckpt, tmp_path):
    # NO geometry flags: arch/embed_dim/depth/... must come from the run's
    # recorded config.json (exporting with mismatched geometry would emit
    # a silently broken artifact)
    out = tmp_path / "hf"
    assert main([str(trained_ckpt), "--format", "hf", "--out", str(out)]) == 0
    assert (out / "model.safetensors").exists()
    assert (out / "config.json").exists()
    assert (out / "preprocessor_config.json").exists()


def test_subset_restore_skips_opt_state(trained_ckpt):
    """The default restore must not materialize the Adam moments (the
    opt_state subtree is PLACEHOLDER-skipped at the orbax layer)."""
    state = load_training_checkpoint(str(trained_ckpt))
    assert "opt_state" not in state
    assert {"params", "swa_params", "swa_n", "step"} <= set(state)
    full = load_training_checkpoint(str(trained_ckpt), with_opt_state=True)
    assert "opt_state" in full
    np.testing.assert_allclose(
        np.asarray(state["params"]["head_linear"]["kernel"], np.float32),
        np.asarray(full["params"]["head_linear"]["kernel"], np.float32),
    )


def test_restore_in_fresh_single_device_process(trained_ckpt):
    """Regression: a checkpoint saved by a multi-device run (replicated or
    FSDP-sharded storage) must restore in a process where those devices do
    not exist — the real export scenario is a single-chip host. Without
    explicit restore_args orbax falls back to the SAVED shardings and
    raises ('sharding passed to deserialization ... Got None')."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    code = (
        "import jax; assert jax.device_count() == 1, jax.devices(); "
        "from maest_tpu.apps.export_release import "
        "load_training_checkpoint, select_params; "
        f"state = load_training_checkpoint({str(trained_ckpt)!r}); "
        "params, which = select_params(state, swa=True); "
        "print('restored', which, state['step'])"
    )
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "restored" in proc.stdout
