import jax.numpy as jnp
import numpy as np

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.train import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)


def test_checkpoint_roundtrip(tmp_path):
    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)}, "step": 7}
    p = str(tmp_path / "ck" / "model_1.msgpack")
    save_checkpoint(p, state)
    template = {"params": {"w": jnp.zeros((2, 3))}, "step": 0}
    loaded = load_checkpoint(p, template)
    np.testing.assert_array_equal(np.asarray(loaded["params"]["w"]),
                                  np.arange(6.0).reshape(2, 3))
    assert loaded["step"] == 7
    save_checkpoint(str(tmp_path / "ck" / "model_2.msgpack"), state)
    assert latest_checkpoint(str(tmp_path / "ck")).endswith("model_2.msgpack")
