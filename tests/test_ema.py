"""EMA: warmup decay rule, shadow updates, eval-with-EMA, ckpt roundtrip."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from dyffusion_tpu.training.ema import ema_update, init_ema
from dyffusion_tpu.training.state import TrainState


def test_warmup_decay_rule_matches_reference():
    """decay_t = min(decay, (1+n)/(10+n)) (ref ema.py:30-32)."""
    params = {"w": jnp.ones((3,))}
    ema = init_ema(params)
    new_params = {"w": jnp.zeros((3,))}
    # first update: n=1 -> decay = min(0.9999, 2/11)
    ema1, n1 = ema_update(ema, new_params, jnp.zeros((), jnp.int32), decay=0.9999)
    d = 2.0 / 11.0
    np.testing.assert_allclose(np.asarray(ema1["w"]), d * 1.0 + (1 - d) * 0.0, rtol=1e-6)
    assert int(n1) == 1
    # large n -> decay saturates at 0.9999
    eman, _ = ema_update(ema, new_params, jnp.asarray(10**6, jnp.int32), decay=0.9999)
    np.testing.assert_allclose(np.asarray(eman["w"]), 0.9999, rtol=1e-6)
    # use_num_updates=False: fixed decay
    emaf, nf = ema_update(ema, new_params, jnp.asarray(-1, jnp.int32), decay=0.5, use_num_updates=False)
    np.testing.assert_allclose(np.asarray(emaf["w"]), 0.5, rtol=1e-6)
    assert int(nf) == -1


def test_train_state_ema_and_eval_params():
    params = {"w": jnp.ones((2,))}
    tx = optax.sgd(0.1)
    state = TrainState.create(params, tx, jax.random.key(0), use_ema=True)
    assert state.eval_params is state.ema_params
    grads = {"w": jnp.ones((2,))}
    state2 = state.apply_gradients(grads)
    # params moved; EMA lags behind (warmup decay pulls strongly early)
    assert abs(float(state2.params["w"][0]) - 0.9) < 1e-6
    assert float(state2.ema_params["w"][0]) != float(state2.params["w"][0])
    assert int(state2.ema_num_updates) == 1
    # without EMA, eval_params are the raw params
    state_no = TrainState.create(params, tx, jax.random.key(0), use_ema=False)
    assert state_no.ema_params is None and state_no.eval_params is params


def test_ema_checkpoint_roundtrip(tmp_path):
    from dyffusion_tpu.training.checkpoint import CheckpointManager

    params = {"w": jnp.arange(4.0)}
    tx = optax.adam(1e-2)
    state = TrainState.create(params, tx, jax.random.key(1), use_ema=True)
    state = state.apply_gradients({"w": jnp.ones((4,))})
    tree = {
        "step": state.step, "params": state.params, "model_state": state.model_state,
        "ema_params": state.ema_params, "ema_num_updates": state.ema_num_updates,
        "opt_state": state.opt_state, "rng": jax.random.key_data(state.rng),
    }
    ckpt = CheckpointManager(str(tmp_path / "run"), monitor="val/crps")
    ckpt.save_last(tree, 1)
    restored = ckpt.restore(tree, "last")
    np.testing.assert_allclose(np.asarray(restored["ema_params"]["w"]), np.asarray(state.ema_params["w"]))
    assert int(restored["ema_num_updates"]) == 1
