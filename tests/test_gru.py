"""GRU parity vs torch nn.GRU (the denoiser's configuration: 2-layer
bidirectional, batch_first)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from voicefixer_tpu.ops import gru as vgru


def _torch_gru_to_params(m: torch.nn.GRU) -> dict:
    params = {}
    for layer in range(m.num_layers):
        for suffix in ["", "_reverse"] if m.bidirectional else [""]:
            params[f"l{layer}{suffix}"] = {
                "w_ih": jnp.asarray(
                    getattr(m, f"weight_ih_l{layer}{suffix}").detach().numpy()),
                "w_hh": jnp.asarray(
                    getattr(m, f"weight_hh_l{layer}{suffix}").detach().numpy()),
                "b_ih": jnp.asarray(
                    getattr(m, f"bias_ih_l{layer}{suffix}").detach().numpy()),
                "b_hh": jnp.asarray(
                    getattr(m, f"bias_hh_l{layer}{suffix}").detach().numpy()),
            }
    return params


@pytest.mark.parametrize("bidirectional,layers", [(False, 1), (True, 2)])
def test_gru_parity(bidirectional, layers):
    torch.manual_seed(0)
    in_dim, hidden = 32, 16
    m = torch.nn.GRU(in_dim, hidden, num_layers=layers,
                     bidirectional=bidirectional, batch_first=True)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 50, in_dim)).astype(np.float32)
    with torch.no_grad():
        ref, _ = m(torch.from_numpy(x))
    got = vgru.gru(jnp.asarray(x), _torch_gru_to_params(m), layers,
                   bidirectional)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=3e-5)


def test_gru_denoiser_shape():
    """Denoiser config: input 512, hidden 256, 2 layers, bidirectional
    (ref restorer/model.py:77-90)."""
    key = jnp.asarray(np.array([0, 1], dtype=np.uint32))
    import jax
    params = vgru.init_gru_params(jax.random.PRNGKey(0), 512, 256, 2, True)
    x = jnp.zeros((1, 30, 512))
    out = vgru.gru(x, params, 2, True)
    assert out.shape == (1, 30, 512)
