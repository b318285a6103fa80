"""Whole-block Pallas kernels vs the XLA reference paths (interpret mode on
CPU — identical kernel code runs compiled on TPU):

  * kernels/fused_ff_block.ff_block — PreNorm LN → w_in → GEGLU → inner LN
    → w_out → residual, custom VJP with tile-wise recompute;
  * kernels/attention_block.attention_core — whole-head attention over the
    fused qkv layout, custom VJP;
  * remat_policy='wide' — fine-grained recompute of the wide tensors only,
    must be numerically invisible.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xclip_tpu.kernels.attention_block import attention_core
from xclip_tpu.kernels.fused_ff_block import ff_block
from xclip_tpu.nn.core import layer_norm_apply


def _ff_ref(x, g_pre, w_in, g_inner, w_out):
    xn = layer_norm_apply({"g": g_pre}, x)
    inner = w_in.shape[-1] // 2
    v, gate = xn @ w_in[:, :inner], xn @ w_in[:, inner:]
    p = v * jax.nn.gelu(gate, approximate=False)
    return x + layer_norm_apply({"g": g_inner}, p) @ w_out


def _ff_args(R=40, D=64, I=128, seed=0):
    npr = np.random.RandomState(seed)
    return (jnp.asarray(npr.randn(R, D).astype(np.float32)) * 0.5,
            jnp.asarray(1 + 0.1 * npr.randn(D).astype(np.float32)),
            jnp.asarray(npr.randn(D, 2 * I).astype(np.float32)) / np.sqrt(D),
            jnp.asarray(1 + 0.1 * npr.randn(I).astype(np.float32)),
            jnp.asarray(npr.randn(I, D).astype(np.float32)) / np.sqrt(I))


def test_ff_block_forward_matches_xla():
    args = _ff_args()
    out_k = ff_block(*args, 16, 64)
    out_r = _ff_ref(*args)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               atol=2e-4)


@pytest.mark.fast
def test_ff_block_grads_match_autodiff():
    args = _ff_args()
    gk = jax.grad(lambda a: (ff_block(*a, 16, 64) ** 2).sum())(args)
    gr = jax.grad(lambda a: (_ff_ref(*a) ** 2).sum())(args)
    for name, a, b in zip(["dx", "dg_pre", "dw_in", "dg_inner", "dw_out"],
                          gk, gr):
        rel = float(jnp.max(jnp.abs(a - b))) / (
            float(jnp.max(jnp.abs(b))) + 1e-9)
        assert rel < 5e-4, (name, rel)


def test_ff_block_stored_h_matches_xla():
    """store_h=True keeps the pre-GEGLU activation as a residual instead of
    recomputing it; forward and every gradient must match the XLA reference
    as tightly as the recompute variant."""
    args = _ff_args()
    out_k = ff_block(*args, 16, 64, None, True)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(_ff_ref(*args)),
                               atol=2e-4)
    gk = jax.grad(lambda a: (ff_block(*a, 16, 64, None, True) ** 2).sum())(args)
    gr = jax.grad(lambda a: (_ff_ref(*a) ** 2).sum())(args)
    for name, a, b in zip(["dx", "dg_pre", "dw_in", "dg_inner", "dw_out"],
                          gk, gr):
        rel = float(jnp.max(jnp.abs(a - b))) / (
            float(jnp.max(jnp.abs(b))) + 1e-9)
        assert rel < 5e-4, (name, rel)


@pytest.mark.fast
def test_ff_block_stored_geglu_matches_xla():
    """store_h='geglu' stores the GEGLU triple (prod, gelu(b), a·gelu'(b))
    instead of h — both backward passes lose their transcendentals; forward
    and every gradient must still match the XLA reference."""
    args = _ff_args()
    out_k = ff_block(*args, 16, 64, None, "geglu")
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(_ff_ref(*args)),
                               atol=2e-4)
    gk = jax.grad(lambda a: (ff_block(*a, 16, 64, None, "geglu") ** 2).sum())(args)
    gr = jax.grad(lambda a: (_ff_ref(*a) ** 2).sum())(args)
    for name, a, b in zip(["dx", "dg_pre", "dw_in", "dg_inner", "dw_out"],
                          gk, gr):
        rel = float(jnp.max(jnp.abs(a - b))) / (
            float(jnp.max(jnp.abs(b))) + 1e-9)
        assert rel < 5e-4, (name, rel)


@pytest.mark.fast
def test_ff_block_fed_dw_pass_matches_self_contained(monkeypatch):
    """The recompute backward's two dW-pass modes — fed by pass 1
    (XCLIP_FF_P2_FED=1: pass 1 emits dh/y/xn, pass 2 is pure dW dots) vs
    self-contained (=0: pass 2 re-derives a/b/dy per column block) — are
    the same math on the same storage-dtype operands, so their gradients
    must agree to fp32 roundoff."""
    from xclip_tpu.kernels.fused_ff_block import (_p1_fed_vmem_bytes,
                                                  _p2_fed_choice)
    args = _ff_args()

    def grads():
        return jax.grad(lambda a: (ff_block(*a, 16, 64) ** 2).sum())(args)

    monkeypatch.setenv("XCLIP_FF_P2_FED", "1")
    g_fed = grads()
    monkeypatch.setenv("XCLIP_FF_P2_FED", "0")
    g_self = grads()
    # CHUNKED fed: force the hand-off budget below this shape's ~84 KB
    # transient so the backward runs the pass-1/pass-2 pair per row chunk
    # (serialized, dW partials summed) — must agree with both other modes
    monkeypatch.setenv("XCLIP_FF_P2_FED", "auto")
    monkeypatch.setenv("XCLIP_FF_P2_FED_MAX_MB", "0.05")
    monkeypatch.setenv("XCLIP_FF_P2_FED_CHUNK_MB", "0.03")
    assert _p2_fed_choice(48, 64, 256, jnp.float32, 16, True,
                          fwd_block_rows=16)[2] > 1
    g_chunk = grads()
    monkeypatch.delenv("XCLIP_FF_P2_FED_MAX_MB")
    monkeypatch.delenv("XCLIP_FF_P2_FED_CHUNK_MB")
    for name, a, b, c in zip(["dx", "dg_pre", "dw_in", "dg_inner", "dw_out"],
                             g_fed, g_self, g_chunk):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=2e-6, err_msg=name)
        np.testing.assert_allclose(np.asarray(c), np.asarray(b),
                                   rtol=2e-6, atol=2e-6,
                                   err_msg="chunked " + name)

    # the auto gates (interpret=True skips the scoped-VMEM check):
    monkeypatch.delenv("XCLIP_FF_P2_FED", raising=False)
    # dim-768 b128 text tower: 34816 rows × (6144+3072+768) bf16 = 663 MB
    # → single-shot
    assert _p2_fed_choice(34816, 768, 6144, jnp.bfloat16, 128, True,
                          fwd_block_rows=256) == (True, 128, 1)
    # 32k-shard text tower: 557056 rows × (4096+2048+512) bf16 = 6.9 GB
    # → chunked: 32 × 217 MB under the 256 MB per-chunk default
    assert _p2_fed_choice(557056, 512, 4096, jnp.bfloat16, 128, True,
                          fwd_block_rows=256) == (True, 128, 32)
    # chunking disabled → self-contained above MAX_MB
    monkeypatch.setenv("XCLIP_FF_P2_FED_CHUNKED", "0")
    assert not _p2_fed_choice(557056, 512, 4096, jnp.bfloat16, 128, True,
                              fwd_block_rows=256)[0]
    monkeypatch.delenv("XCLIP_FF_P2_FED_CHUNKED")

    # the scoped-VMEM estimate, calibrated on the compiler's report at
    # the dim-768 128-row tile (36.85 MiB): estimate must bound it from
    # above but stay under the 40 MiB limit the fed bench runs at
    est128 = _p1_fed_vmem_bytes(128, 768, 6144, 2)
    assert 36.85 * 2**20 < est128 <= 40 * 2**20, est128 / 2**20

    # under a 32 MiB limit the 128-row tile doesn't fit, and with
    # TRANSPOSED stats (min_rows=128: their block's lane dim is the row
    # tile, 128-divisible per Mosaic) halving is illegal → fed gates OFF
    # (measured lowering failure at br=64 before this gate); without the
    # transposed constraint it halves to 64, which fits
    monkeypatch.setenv("LIBTPU_INIT_ARGS",
                       "--xla_tpu_scoped_vmem_limit_kib=32768")
    assert _p2_fed_choice(34816, 768, 6144, jnp.bfloat16, 128, False,
                          min_rows=128) == (False, 128, 1)
    assert _p2_fed_choice(34816, 768, 6144, jnp.bfloat16, 128, False,
                          min_rows=32) == (True, 64, 1)
    # at 40 MiB the full 128-row tile fits regardless
    monkeypatch.setenv("LIBTPU_INIT_ARGS",
                       "--xla_tpu_scoped_vmem_limit_kib=40960")
    assert _p2_fed_choice(34816, 768, 6144, jnp.bfloat16, 128, False,
                          min_rows=128) == (True, 128, 1)


def test_ff_block_3d_and_padding():
    args = _ff_args(R=40)
    x3 = args[0].reshape(4, 10, 64)
    out = ff_block(x3, *args[1:], 16, 64)
    assert out.shape == (4, 10, 64)
    np.testing.assert_allclose(np.asarray(out.reshape(40, 64)),
                               np.asarray(ff_block(*args, 16, 64)), atol=1e-5)


def _attn_ref(qkv, mask, heads, dim_head, scale, causal):
    b, n, _ = qkv.shape
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (t.reshape(b, n, heads, dim_head).transpose(0, 2, 1, 3)
               for t in (q, k, v))
    sim = jnp.einsum("bhid,bhjd->bhij", q * scale, k)
    big_neg = -jnp.finfo(sim.dtype).max
    sim = jnp.where(mask[:, None, None, :], sim, big_neg)
    if causal:
        i = jnp.arange(n)[:, None]
        j = jnp.arange(n)[None, :]
        sim = jnp.where(j > i, big_neg, sim)
    attn = jax.nn.softmax(sim, axis=-1)
    out = jnp.einsum("bhij,bhjd->bhid", attn, v)
    return out.transpose(0, 2, 1, 3).reshape(b, n, heads * dim_head)


@pytest.mark.parametrize("causal", [False, True])
def test_attention_core_matches_xla(causal):
    npr = np.random.RandomState(1)
    b, n, heads, d = 3, 17, 8, 16      # 8×16 = one 128-lane head group
    qkv = jnp.asarray(npr.randn(b, n, 3 * heads * d).astype(np.float32))
    mask = jnp.asarray(npr.rand(b, n) > 0.2)
    mask = mask.at[:, 0].set(True)
    scale = d ** -0.5

    out_k = attention_core(qkv, mask, heads, d, scale, causal)
    out_r = _attn_ref(qkv, mask, heads, d, scale, causal)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               atol=2e-5)

    gk = jax.grad(lambda q: (attention_core(q, mask, heads, d, scale,
                                            causal) ** 2).sum())(qkv)
    gr = jax.grad(lambda q: (_attn_ref(q, mask, heads, d, scale,
                                       causal) ** 2).sum())(qkv)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), atol=5e-4)


def _mock_cfg():
    return dict(dim_text=64, dim_image=64, dim_latent=64, num_text_tokens=100,
                text_enc_depth=2, text_seq_len=16, text_heads=2,
                text_dim_head=16, visual_enc_depth=2, visual_heads=2,
                visual_dim_head=16, visual_image_size=32,
                visual_patch_size=16, visual_patch_dropout=0.5)


def _mock_batch():
    npr = np.random.RandomState(0)
    return (jnp.asarray(npr.randint(1, 100, (4, 16))),
            jnp.asarray(npr.randn(4, 3, 32, 32).astype(np.float32)))


@pytest.mark.parametrize("variant", [
    dict(attn_impl="fused"),
    dict(ff_impl="block"),
    dict(ff_impl="block_stored"),
    dict(attn_impl="fused", ff_impl="block_stored"),
    dict(attn_impl="fused_recompute", ff_impl="block"),
    dict(attn_impl="fused_qkv", ff_impl="block"),
    dict(checkpoint_during_training=True, remat_policy="wide"),
    dict(attn_impl="fused", text_rotary_pos_emb=True),
    dict(attn_impl="fused", text_causal_mask=True, text_eos_id=99),
])
def test_model_loss_and_grads_invariant_to_impl(variant):
    """Every accelerated implementation must be numerically invisible at the
    model boundary: same loss, same grads as the plain XLA path."""
    from xclip_tpu import CLIP

    cfg = _mock_cfg()
    if variant.get("attn_impl") == "fused":
        # the fused kernel needs 128-lane head groups (kernel `supported`)
        cfg.update(text_heads=8, text_dim_head=16,
                   visual_heads=8, visual_dim_head=16)
    model_flags = {k: v for k, v in variant.items()
                   if k in ("text_rotary_pos_emb", "text_causal_mask",
                            "text_eos_id")}
    impl_flags = {k: v for k, v in variant.items() if k not in model_flags}
    text, image = _mock_batch()

    base = CLIP(**cfg, **model_flags, key=jax.random.PRNGKey(5))
    alt = CLIP(**cfg, **model_flags, **impl_flags, key=jax.random.PRNGKey(5))

    def lg(clip):
        f = lambda p: clip.model.apply(p, text, image, return_loss=True,
                                       rng=jax.random.PRNGKey(1))
        return jax.value_and_grad(f)(base.params)

    l0, g0 = lg(base)
    l1, g1 = lg(alt)
    assert abs(float(l0) - float(l1)) < 3e-5
    mx = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), g0, g1)))
    assert mx < 5e-4, mx


def _mega_ref(x, g_pre, w_qkv, w_out, g_out, mask, heads, d, scale, causal):
    xn = layer_norm_apply({"g": g_pre}, x)
    out = _attn_ref(xn @ w_qkv, mask, heads, d, scale, causal)
    return x + layer_norm_apply({"g": g_out}, out @ w_out)


@pytest.mark.parametrize("store_qkv", [False, True, "qkv"])
@pytest.mark.parametrize("causal", [False, True])
def test_attention_megablock_matches_xla(causal, store_qkv):
    """store_qkv=True additionally exercises the forward-stored residuals
    (qkv/attnout/proj + the fp32 row-stats tensor whose stored softmax
    max/normalizer and LN mean/inv replace the backward's reductions);
    store_qkv="qkv" the qkv-only middle variant (stored qkv read by a
    recompute backward with in-VMEM dW accumulation)."""
    from xclip_tpu.kernels.attention_megablock import attention_block

    npr = np.random.RandomState(2)
    b, n, heads, d, dim = 3, 19, 4, 16, 64
    x = jnp.asarray(npr.randn(b, n, dim).astype(np.float32)) * 0.5
    g_pre = jnp.asarray(1 + 0.1 * npr.randn(dim).astype(np.float32))
    w_qkv = jnp.asarray(npr.randn(dim, 3 * heads * d).astype(np.float32)) / 8
    w_out = jnp.asarray(npr.randn(heads * d, dim).astype(np.float32)) / 8
    g_out = jnp.asarray(1 + 0.1 * npr.randn(dim).astype(np.float32))
    mask = jnp.asarray(npr.rand(b, n) > 0.2).at[:, 0].set(True)
    scale = d ** -0.5

    args = (x, g_pre, w_qkv, w_out, g_out, mask)
    out_k = attention_block(*args, heads, d, scale, causal, None, True,
                            store_qkv)
    out_r = _mega_ref(*args, heads, d, scale, causal)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               atol=5e-5)

    gk = jax.grad(lambda a: (attention_block(*a, mask, heads, d, scale,
                                             causal, None, True,
                                             store_qkv) ** 2).sum())(args[:5])
    gr = jax.grad(lambda a: (_mega_ref(*a, mask, heads, d, scale,
                                       causal) ** 2).sum())(args[:5])
    for name, ka, ra in zip(["dx", "dg_pre", "dw_qkv", "dw_out", "dg_out"],
                            gk, gr):
        rel = float(jnp.max(jnp.abs(ka - ra))) / (
            float(jnp.max(jnp.abs(ra))) + 1e-9)
        assert rel < 5e-4, (name, rel)


@pytest.mark.parametrize("store_qkv", [False, True, "qkv"])
def test_fully_masked_row_matches_xla_semantics(store_qkv):
    """An all-padding caption (all-False mask row) must produce the same
    output and grads as the XLA path, which softmaxes a constant
    -finfo.max row into UNIFORM attention (not zeros) — in both backward
    variants (the stored one reconstructs dead-row p from the stored
    m=0 / l=n_real stats)."""
    from xclip_tpu.kernels.attention_megablock import attention_block

    npr = np.random.RandomState(3)
    b, n, heads, d, dim = 2, 9, 4, 16, 64
    x = jnp.asarray(npr.randn(b, n, dim).astype(np.float32)) * 0.5
    g = jnp.ones((dim,), jnp.float32)
    w_qkv = jnp.asarray(npr.randn(dim, 3 * heads * d).astype(np.float32)) / 8
    w_out = jnp.asarray(npr.randn(heads * d, dim).astype(np.float32)) / 8
    mask = jnp.ones((b, n), dtype=bool).at[1].set(False)   # row 1 dead
    scale = d ** -0.5

    out_k = attention_block(x, g, w_qkv, w_out, g, mask, heads, d, scale,
                            False, None, True, store_qkv)
    out_r = _mega_ref(x, g, w_qkv, w_out, g, mask, heads, d, scale, False)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               atol=5e-5)

    gk = jax.grad(lambda q: (attention_block(q, g, w_qkv, w_out, g, mask,
                                             heads, d, scale, False, None,
                                             True, store_qkv) ** 2
                             ).sum())(x)
    gr = jax.grad(lambda q: (_mega_ref(q, g, w_qkv, w_out, g, mask, heads,
                                       d, scale, False) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), atol=1e-3)

    # the head-group kernel too
    qkv = jnp.asarray(npr.randn(b, n, 3 * 8 * 16).astype(np.float32))
    out_g = attention_core(qkv, mask, 8, 16, scale, False)
    out_gr = _attn_ref(qkv, mask, 8, 16, scale, False)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_gr),
                               atol=5e-5)
    gg = jax.grad(lambda q: (attention_core(q, mask, 8, 16, scale,
                                            False) ** 2).sum())(qkv)
    ggr = jax.grad(lambda q: (_attn_ref(q, mask, 8, 16, scale,
                                        False) ** 2).sum())(qkv)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(ggr), atol=1e-3)


def test_sequence_alignment_pad_is_invisible():
    """transformer_apply sublane-aligns sequences ≥128 for the Pallas
    stack (257→272-style pad, layers.py align_seq); the padded rows must
    be numerically invisible: same output and grads as the XLA path."""
    from xclip_tpu.nn.layers import transformer_init, transformer_apply

    dim, heads, dh, n, b = 128, 8, 16, 131, 2   # n % 16 != 0 triggers it
    key = jax.random.PRNGKey(0)
    params = transformer_init(key, dim=dim, depth=1, heads=heads,
                              dim_head=dh, ff_mult=2)
    npr = np.random.RandomState(0)
    x = jnp.asarray(npr.randn(b, n, dim).astype(np.float32)) * 0.5
    mask = jnp.asarray(npr.rand(b, n) > 0.2).at[:, 0].set(True)

    def loss(p, impl_kwargs):
        out = transformer_apply(p, x, heads=heads, dim_head=dh, mask=mask,
                                scan_layers=False, **impl_kwargs)
        return (out ** 2).sum()

    ref, gref = jax.value_and_grad(loss)(params, {})
    for kwargs in (dict(attn_impl="fused", ff_impl="block_stored"),
                   dict(attn_impl="fused_recompute", ff_impl="block"),
                   dict(attn_impl="fused_qkv", ff_impl="block")):
        v, g = jax.value_and_grad(loss)(params, kwargs)
        assert abs(float(v) - float(ref)) / abs(float(ref)) < 2e-5, kwargs
        mx = max(jax.tree.leaves(jax.tree.map(
            lambda a, r: float(jnp.max(jnp.abs(a - r))), g, gref)))
        scale = max(jax.tree.leaves(jax.tree.map(
            lambda r: float(jnp.max(jnp.abs(r))), gref)))
        assert mx < 5e-4 * scale, (kwargs, mx, scale)


def test_supported_gate_reads_active_vmem_limit(monkeypatch):
    """The megablock VMEM gate must track the ACTIVE Mosaic scoped limit
    (LIBTPU_INIT_ARGS): under a hard 16MB environment the flagship text
    shape fails closed; under the 24MB xclip_tpu/__init__ requests it
    passes for both backward variants."""
    from xclip_tpu.kernels._common import scoped_vmem_limit_bytes
    from xclip_tpu.kernels.attention_megablock import supported

    monkeypatch.setenv("LIBTPU_INIT_ARGS",
                       "--xla_tpu_scoped_vmem_limit_kib=16384")
    assert scoped_vmem_limit_bytes() == 16 * 1024 * 1024
    assert not supported(8, 64, 512, 384, jnp.bfloat16, store_qkv=True)

    monkeypatch.setenv("LIBTPU_INIT_ARGS",
                       "--xla_tpu_scoped_vmem_limit_kib=24576")
    assert supported(8, 64, 512, 384, jnp.bfloat16, store_qkv=True)
    assert supported(8, 64, 512, 384, jnp.bfloat16)
    # the qkv-only middle variant fits the flagship's 24MB too
    assert supported(8, 64, 512, 384, jnp.bfloat16, store_qkv="qkv")
    # the ViT-B/16-class towers need 32MB (docs/SCALING.md measured row)
    assert not supported(12, 64, 768, 384, jnp.bfloat16, store_qkv=True)
    assert not supported(12, 64, 768, 384, jnp.bfloat16, store_qkv="qkv")
    monkeypatch.setenv("LIBTPU_INIT_ARGS",
                       "--xla_tpu_scoped_vmem_limit_kib=32768")
    assert supported(12, 64, 768, 384, jnp.bfloat16, store_qkv=True)
    assert supported(12, 64, 768, 384, jnp.bfloat16, store_qkv="qkv")
