"""Production-shape kernel dispatch: the hot-path routing decisions are
pure functions of (shape, dtype), so they are pinned here on CPU.

Guards against the r4 regression class where a VMEM cost model drifted
from the kernel's real allocations and silently routed every ResUNet
level back to the XLA conv (plan_tm hardcoded tm=2048 and costed the x9
slab at fp32 while the kernel allocates it at matmul dtype).
"""

import jax
import jax.numpy as jnp
import pytest

from voicefixer_tpu.config import DEFAULT_CONFIG
from voicefixer_tpu.kernels import convblock, resstack
from voicefixer_tpu.kernels.resstream import up_stream_ok
from voicefixer_tpu.models import resunet
from voicefixer_tpu.ops.conv import fold_bn_eval
from voicefixer_tpu.ops.precision import set_precision


@pytest.fixture(scope="module")
def unet_params():
    cfg = DEFAULT_CONFIG.unet
    p = fold_bn_eval(resunet.init(jax.random.PRNGKey(0), cfg))
    return jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)


def _level_shapes():
    """(name, params key path, [T, F, Cin]) per production U-Net level on
    the 30 s chunk (t_mel 3001 -> T padded to 3008, F = 127)."""
    cfg = DEFAULT_CONFIG.unet
    t_mel = int(30 * DEFAULT_CONFIG.pipeline.sample_rate) // 441 + 1
    t = -(-t_mel // cfg.downsample_ratio) * cfg.downsample_ratio
    rows = []
    h, w = t, 127
    for i, co in enumerate(cfg.encoder_channels):
        rows.append((f"enc{i + 1}", co, (h, w, co)))
        h, w = h // 2, w // 2
    h = t // 2 ** (cfg.levels - 1)
    w = max(127 // 2 ** (cfg.levels - 1), 1)
    for i, co in enumerate(reversed(cfg.encoder_channels)):
        rows.append((f"dec{i + 1}", co, (h, w, 2 * co)))
        h, w = h * 2, w * 2
    return rows


def test_convblock_plan_production_bf16(unet_params):
    """plan_tm stays FEASIBLE for the narrow levels (C <= 128) and rejects
    the wide deep levels — the kernel remains available behind the
    VF_TPU_PALLAS_CONVBLOCK opt-in, but production routing defaults to XLA
    since r5 measured the kernel slower at every resolvable level
    (models/resunet.py:_conv_block_res docstring has the numbers)."""
    set_precision("default")
    try:
        got = {}
        for name, co, (h, w, ci) in _level_shapes():
            p = unet_params[name]["block2"]
            x = jnp.zeros((1, h, w, ci), jnp.bfloat16)
            got[name] = convblock.plan_tm(p, x, training=False)
        for name in ("enc1", "enc2", "enc3", "dec5", "dec6"):
            assert got[name] is not None, f"{name} lost plan_tm feasibility"
        for name in ("enc4", "enc5", "enc6", "dec1", "dec2", "dec3", "dec4"):
            assert got[name] is None  # wide: im2col path by design
    finally:
        set_precision("highest")


def test_convblock_production_routing_defaults_to_xla(unet_params,
                                                     monkeypatch):
    """The U-Net must NOT dispatch the Pallas convblock unless explicitly
    opted in — r5's serving-path measurement found the kernel a ~13 ms/chunk
    net loss (34.8 vs 21.9 ms folded-BN stage total), a regression that
    had hidden behind the headline bench's unfolded params."""
    import voicefixer_tpu.kernels as kernels
    from voicefixer_tpu.kernels import convblock as cb
    from voicefixer_tpu.models.resunet import _conv_block_res

    monkeypatch.delenv("VF_TPU_PALLAS_CONVBLOCK", raising=False)
    monkeypatch.setattr(kernels, "use", lambda name: True)  # fake TPU
    called = []
    monkeypatch.setattr(cb, "plan_tm",
                        lambda *a, **k: called.append(1) or None)
    x = jnp.zeros((1, 64, 31, 32), jnp.bfloat16)
    p = unet_params["enc1"]["block2"]
    _conv_block_res(p, x, 0.01, training=False)
    assert not called, "convblock dispatched without the opt-in env"

    monkeypatch.setenv("VF_TPU_PALLAS_CONVBLOCK", "1")
    _conv_block_res(p, x, 0.01, training=False)
    assert called, "opt-in env did not restore the dispatch path"


def test_resunet_routes_deep_levels_to_im2col(unet_params):
    """The deep wide levels satisfy the _conv_block_res im2col gate
    (t*f <= 20000 and ci >= 128) so none of them fall back to the
    fragmenting lax.conv at inference."""
    for name in ("enc4", "enc5", "enc6", "dec1", "dec2", "dec3", "dec4"):
        h, w, ci = next(s for n, _, s in _level_shapes() if n == name)
        assert h * w <= 20000 and ci >= 128, name


def test_vocoder_stream_dispatch_production_bf16():
    """The production vocoder's late stages route to the streaming kernels
    at bf16: fused up+res for stages 2/3, stream for a pre-folded C=128
    stack."""
    dils = tuple(3 ** (i % 10) for i in range(8))
    t_mel = int(30 * DEFAULT_CONFIG.pipeline.sample_rate) // 441 + 1
    t_mel += t_mel % 2 + 4
    t_res3 = t_mel * 441
    assert up_stream_ok(256, 128, 3, dils, t_res3 // 3, isz=2, wsz=2)
    assert up_stream_ok(128, 64, 3, dils, t_res3 // 2 + 4000, isz=2, wsz=2)
    assert resstack.stream_ok(128, dils, t_res3 // 2 + 4000, isz=2, wsz=2)
    # fp32 parity path must stay on the chained planner (VMEM)
    assert not resstack.stream_ok(128, dils, t_res3, isz=4, wsz=4)


def test_res0_res1_chain_plans_production_bf16():
    """Pin the FULL production ResStack routing table (VERDICT r4 next-8):
    res0 (C=512) chains the small dilations and runs the huge-dilation
    singles (729, 2187) through Pallas — since r5 the shifted-tap kernel
    serves the blocks the halo design couldn't fit, so NO block falls back
    to XLA conv; res1 (C=256) keeps every block in Pallas. A cost-model
    drift that knocks any block off its documented winner fails here, not
    in bench archaeology."""
    dils = tuple(3 ** (i % 10) for i in range(8))
    t_mel = int(30 * DEFAULT_CONFIG.pipeline.sample_rate) // 441 + 1
    t_mel += t_mel % 2 + 4
    t_res0, t_res1 = t_mel * 7, t_mel * 49

    res0 = resstack.plan_chain(512, dils, 2, 2, t_total=t_res0)
    assert all(tt is not None for _, _, tt in res0), res0
    assert res0[0][1] >= 2, f"small dilations should chain: {res0}"
    # the dil-2187 single (XLA conv until r5) now dispatches shifted-tap
    assert isinstance(res0[-1][2], tuple) and res0[-1][2][0] == "shift", res0

    res1 = resstack.plan_chain(256, dils, 2, 2, t_total=t_res1)
    assert all(tt is not None for _, _, tt in res1), res1
    for _, _, tt in res1:
        assert (tt[0] == "shift" if isinstance(tt, tuple)
                else tt >= 512), res1


def test_up_res_stage_dispatches_fused_production_bf16():
    """_up_res_stage must return non-None (the fused streaming kernel) for
    stages 2 and 3 at production shapes/dtypes. Exercised at a reduced T
    in interpret mode so CPU CI can actually run the dispatch path; the
    eligibility predicates for the full 30 s shapes are pinned in
    test_vocoder_stream_dispatch_production_bf16."""
    from voicefixer_tpu.kernels.resstack import up_res_stack

    cfg = DEFAULT_CONFIG.vocoder
    set_precision("default")
    try:
        for i, (cin, cout) in ((2, (256, 128)), (3, (128, 64))):
            scale = cfg.upsample_scales[i]
            dils = tuple(3 ** (j % 10) for j in range(cfg.resstack_depth[i]))
            up = {"w": jnp.zeros((2 * scale, cin, cout), jnp.bfloat16),
                  "b": jnp.zeros((cout,), jnp.bfloat16)}
            res = [{"c1": {"w": jnp.zeros((3, cout, cout), jnp.bfloat16),
                           "b": jnp.zeros((cout,), jnp.bfloat16)},
                    "c2": {"w": jnp.zeros((3, cout, cout), jnp.bfloat16),
                           "b": jnp.zeros((cout,), jnp.bfloat16)}}
                   for _ in dils]
            t_in = 38808 // scale  # small but >= the kernels' 2*lag floor
            x = jnp.zeros((1, t_in, cin), jnp.bfloat16)
            out = up_res_stack(up, res, x, scale, 3, 0.2, final_slope=0.2,
                               matmul_dtype=jnp.bfloat16, interpret=True)
            assert out is not None, f"stage {i} lost its fused dispatch"
            assert out.shape == (1, t_in * scale, cout)
    finally:
        set_precision("highest")
