"""NaN guard: a poisoned batch must not poison the parameters."""

import numpy as np

import jax
import jax.numpy as jnp

from maest_tpu.models.config import MAESTConfig
from maest_tpu.models.vit import MAESTNet, init_params
from maest_tpu.train.state import TrainState, make_optimizer
from maest_tpu.train.steps import AugmentConfig, make_train_step


def test_nonfinite_batch_skips_update():
    cfg = MAESTConfig(img_size=(26, 46), patch_size=16, stride=(10, 10),
                      embed_dim=32, depth=1, num_heads=4, num_classes=4)
    net = MAESTNet(cfg, dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(lr_schedule=1e-3, adamw=True)
    state = TrainState.create(params, tx)
    step = make_train_step(net, tx, AugmentConfig(masking=False,
                                                  mixup_alpha=0.0),
                           donate=False)
    rng = np.random.default_rng(0)
    good = {
        "x": jnp.asarray(rng.standard_normal((2, 26, 46)), jnp.float32),
        "y": jnp.asarray((rng.random((2, 4)) > 0.5).astype(np.float32)),
    }
    bad = {"x": good["x"].at[0, 0, 0].set(jnp.nan), "y": good["y"]}
    key = jax.random.PRNGKey(1)

    before = np.asarray(state.params["cls_token"])
    state, m = step(state, bad, key)
    assert float(m["nonfinite_skipped"]) == 1.0
    np.testing.assert_array_equal(np.asarray(state.params["cls_token"]), before)
    assert int(state.step) == 1  # step counter still advances

    state, m = step(state, good, key)
    assert float(m["nonfinite_skipped"]) == 0.0
    assert not np.array_equal(np.asarray(state.params["cls_token"]), before)
