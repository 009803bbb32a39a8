"""UMT5 encoder vs independent torch port of the reference equations."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from sparse_videogen_tpu.models.common import t5 as T5

CFG = T5.T5Config(vocab_size=120, dim=32, dim_attn=32, dim_ffn=48, num_heads=4,
                  num_layers=2, num_buckets=8, max_dist=16)


def torch_t5_encode(params, cfg, ids, mask):
    p = jax.tree.map(lambda a: np.asarray(a, np.float32), params)
    x = torch.tensor(p["token_embedding"])[torch.tensor(ids)]
    gelu = lambda t: 0.5 * t * (1.0 + torch.tanh(math.sqrt(2.0 / math.pi) * (t + 0.044715 * t**3)))
    ln = lambda t, w: t * torch.rsqrt(t.pow(2).mean(-1, keepdim=True) + cfg.eps) * torch.tensor(w)

    # bucket table (t5.py:234-250)
    L = ids.shape[1]
    rel = torch.arange(L)[None, :] - torch.arange(L)[:, None]
    nb = cfg.num_buckets // 2
    buckets = (rel > 0).long() * nb
    rel = rel.abs()
    max_exact = nb // 2
    large = max_exact + (
        torch.log(rel.float() / max_exact) / math.log(cfg.max_dist / max_exact) * (nb - max_exact)
    ).long()
    large = torch.min(large, torch.full_like(large, nb - 1))
    buckets += torch.where(rel < max_exact, rel, large)

    maskt = torch.tensor(mask)
    H, Dh = cfg.num_heads, cfg.dim_attn // cfg.num_heads
    B = ids.shape[0]
    for li in range(cfg.num_layers):
        bp = jax.tree.map(lambda a: a[li], p["blocks"])
        bias = torch.tensor(bp["rel_embedding"])[buckets].permute(2, 0, 1)[None]
        y = ln(x, bp["norm1"])
        q = (y @ torch.tensor(bp["q"]["w"])).view(B, L, H, Dh)
        k = (y @ torch.tensor(bp["k"]["w"])).view(B, L, H, Dh)
        v = (y @ torch.tensor(bp["v"]["w"])).view(B, L, H, Dh)
        s = torch.einsum("binc,bjnc->bnij", q, k) + bias
        s = s.masked_fill(maskt[:, None, None, :] == 0, torch.finfo(torch.float32).min)
        a = F.softmax(s, dim=-1)
        o = torch.einsum("bnij,bjnc->binc", a, v).reshape(B, L, -1)
        x = x + o @ torch.tensor(bp["o"]["w"])
        y = ln(x, bp["norm2"])
        y = (y @ torch.tensor(bp["fc1"]["w"])) * gelu(y @ torch.tensor(bp["gate"]["w"]))
        x = x + y @ torch.tensor(bp["fc2"]["w"])
    return ln(x, p["norm"]).numpy()


def test_umt5_encoder_matches_torch():
    params = T5.init_t5_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, CFG.vocab_size, (2, 20)).astype(np.int32)
    mask = np.ones((2, 20), np.int32)
    mask[0, 15:] = 0
    out = np.asarray(T5.t5_encode(params, CFG, jnp.asarray(ids), jnp.asarray(mask)))
    ref = torch_t5_encode(params, CFG, ids, mask)
    np.testing.assert_allclose(out, ref, rtol=3e-3, atol=3e-4)


def test_bucket_table_properties():
    b = T5.relative_position_buckets(40, 32, 128)
    assert b.min() >= 0 and b.max() < 32
    assert b[0, 0] == 0
    # symmetry of structure: future vs past use disjoint bucket halves
    assert (b[0, 1:] >= 16).all() and (b[1:, 0] < 16).all()


def test_t5_v1_shared_bias_parity_vs_hf():
    """T5 v1.0 variant (relu, shared relative bias — the Cosmos text
    encoder t5-11b) vs transformers T5EncoderModel."""
    import torch
    from transformers import T5Config as HFT5Config
    from transformers import T5EncoderModel

    from sparse_videogen_tpu.io import checkpoint as CK

    hf_cfg = HFT5Config(vocab_size=120, d_model=32, d_kv=8, d_ff=48, num_layers=3,
                        num_heads=4, relative_attention_num_buckets=8,
                        relative_attention_max_distance=16, feed_forward_proj="relu",
                        dense_act_fn="relu", is_gated_act=False, dropout_rate=0.0)
    torch.manual_seed(0)
    hf = T5EncoderModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    cfg = T5.T5Config(vocab_size=120, dim=32, dim_attn=32, dim_ffn=48, num_heads=4,
                      num_layers=3, num_buckets=8, max_dist=16,
                      gated_ffn=False, shared_rel_bias=True, ffn_act="relu")
    params = CK.convert_t5_hf(sd, cfg, dtype=jnp.float32)
    ids = np.random.default_rng(0).integers(0, 120, (2, 9)).astype(np.int64)
    mask = np.ones((2, 9), np.int64)
    mask[1, 6:] = 0
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    got = np.asarray(T5.t5_encode(params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)))
    np.testing.assert_allclose(got[0], ref[0], atol=2e-4)
    np.testing.assert_allclose(got[1, :6], ref[1, :6], atol=2e-4)
