"""TPU tier: compiled Pallas kernels + bf16 numerics on real hardware.

The main suite runs on CPU (fp32, interpret-mode Pallas) — see conftest.py.
These tests spawn a SUBPROCESS with the TPU tunnel restored and compile the
real kernels. Opt-in via RUN_TPU_TESTS=1 because each subprocess pays
~20-60s of compile+tunnel time and only one JAX/TPU process may run at a
time on this machine:

    RUN_TPU_TESTS=1 python -m pytest tests/test_tpu_compiled.py -m tpu -q
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.tpu

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tpu_env():
    env = dict(os.environ)
    # undo the CPU forcing done by conftest for this process tree
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env["PALLAS_AXON_POOL_IPS"] = env.get("_SURYA_ORIG_POOL_IPS", "")
    env["ALLOW_RANDOM_WEIGHTS"] = "true"
    return env


def _run_on_tpu(script: str, timeout=540) -> str:
    proc = subprocess.run(
        [sys.executable, "-c", script], env=_tpu_env(), cwd=_REPO,
        capture_output=True, text=True, timeout=timeout,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-4000:]}"
    return proc.stdout


requires_tpu = pytest.mark.skipif(
    not os.environ.get("RUN_TPU_TESTS"), reason="TPU tier is opt-in (RUN_TPU_TESTS=1)"
)


@requires_tpu
def test_decode_kernel_compiled_parity():
    """Compiled GQA decode kernel (bf16 + int8 caches) vs jnp reference."""
    out = _run_on_tpu(
        """
import numpy as np
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != "cpu", jax.devices()
from surya_tpu.ops import decode_attn
from surya_tpu.models.qwen_decoder import quantize_kv

rng = np.random.default_rng(0)
L, B, H, kvh, D, S, K = 2, 16, 12, 4, 128, 512, 32
q  = jnp.asarray(rng.standard_normal((B, H, D)) * 0.3, jnp.bfloat16)
kcf = jnp.asarray(rng.standard_normal((L, B, kvh, S, D)) * 0.3, jnp.bfloat16)
vcf = jnp.asarray(rng.standard_normal((L, B, kvh, S, D)) * 0.3, jnp.bfloat16)
ck = jnp.asarray(rng.standard_normal((L, B, kvh, K, D)) * 0.3, jnp.bfloat16)
cv = jnp.asarray(rng.standard_normal((L, B, kvh, K, D)) * 0.3, jnp.bfloat16)
lens = jnp.asarray(rng.integers(0, S, B).astype(np.int32))
step = jnp.int32(7)

for tag, (kc, vc, ks, vs) in {
    "bf16": (kcf, vcf, None, None),
    "int8": (*quantize_kv(kcf), None, None),
}.items():
    if tag == "int8":
        kc, ks = quantize_kv(kcf); vc, vs = quantize_kv(vcf)
    for layer in (0, 1):
        o_p = np.asarray(decode_attn.gqa_decode_pallas(q, kc, vc, lens, ck, cv, step, layer, ks, vs), np.float32)
        o_r = np.asarray(decode_attn.gqa_decode_reference(q, kc, vc, lens, ck, cv, step, layer, ks, vs), np.float32)
        err = np.abs(o_p - o_r).max()
        assert err < 5e-3, (tag, layer, err)
print("DECODE_KERNEL_OK")
"""
    )
    assert "DECODE_KERNEL_OK" in out


@requires_tpu
def test_encoder_flash_kernel_compiled_parity():
    """Compiled segmented block-diagonal flash attention vs jnp sdpa."""
    out = _run_on_tpu(
        """
import numpy as np
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != "cpu", jax.devices()
from surya_tpu.ops import flash, attention as att

rng = np.random.default_rng(0)
S, H, D = 512, 4, 64
q = jnp.asarray(rng.standard_normal((S, H, D)) * 0.3, jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((S, H, D)) * 0.3, jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((S, H, D)) * 0.3, jnp.bfloat16)
# 3 segments of 128/256/64, rest padding (-1)
seg = np.full(S, -1, np.int32)
seg[:128] = 0; seg[128:384] = 1; seg[384:448] = 2
# per q-block KV window start (multiple of block_k), covering that block's
# segment; contract (qwen_encoder._chunk_ranges:135): start + kv_range <= S
kv_starts = np.array([0, 128, 128, 256], np.int32)  # block_q=128 -> 4 q blocks
out = flash.segmented_block_attention(q, k, v, jnp.asarray(seg), jnp.asarray(kv_starts), kv_range=256, block_q=128, block_k=128)

mask = (seg[:, None] == seg[None, :]) & (seg[:, None] >= 0)
bias = att.mask_to_bias(jnp.asarray(mask)[None, None])
ref = att.sdpa(q[None], k[None], v[None], bias=bias)[0]
valid = seg >= 0
err = np.abs(np.asarray(out, np.float32)[valid] - np.asarray(ref, np.float32)[valid]).max()
assert err < 5e-3, err
print("FLASH_KERNEL_OK")
"""
    )
    assert "FLASH_KERNEL_OK" in out


@requires_tpu
def test_decode_chunk_bf16_on_tpu():
    """Full decode_chunk (while_loop + kernel + commit) in bf16 on TPU:
    pallas and jnp paths agree on greedy trajectories for a well-separated
    random model."""
    out = _run_on_tpu(
        """
import numpy as np
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != "cpu", jax.devices()
from surya_tpu.models import foundation, qwen_decoder, qwen_encoder

dec = qwen_decoder.DecoderConfig(vocab_size=256, hidden_size=256, intermediate_size=512,
                                 num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4)
enc = qwen_encoder.EncoderConfig(depth=1, hidden_size=64, intermediate_size=128, num_heads=4,
                                 window_size=56, out_hidden_size=256, fullatt_block_indexes=())
cfg = foundation.FoundationConfig(vocab_size=256, encoder=enc, decoder=dec)
params = foundation.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)

B, S = 8, 256
rng = np.random.default_rng(0)
cache = qwen_decoder.init_cache(dec, B, S, jnp.bfloat16)
cache["k"] = jnp.asarray(rng.standard_normal(cache["k"].shape) * 0.3, jnp.bfloat16)
cache["v"] = jnp.asarray(rng.standard_normal(cache["v"].shape) * 0.3, jnp.bfloat16)
cache["len"] = jnp.asarray(rng.integers(10, S - 40, B).astype(np.int32))
last = jnp.asarray(rng.integers(5, 250, B).astype(np.int32))
active = jnp.ones(B, bool)

outs = {}
for up in (True, False):
    c = {k: v.copy() for k, v in cache.items()}
    _, toks, scores, _, _, _ = jax.jit(
        lambda p, c, l, a, up=up: foundation.decode_chunk(p, cfg, c, l, a, num_steps=8, use_pallas=up)
    )(params, c, last, active)
    outs[up] = (np.asarray(toks), np.asarray(scores))
# bf16: trajectories may diverge after an argmax tie-break; require the first
# steps to agree and scores to be close where tokens agree
t_p, s_p = outs[True]; t_r, s_r = outs[False]
agree = t_p == t_r
assert agree[:, 0].all(), (t_p[:, 0], t_r[:, 0])
assert np.abs(s_p[agree] - s_r[agree]).max() < 0.05
print("DECODE_CHUNK_BF16_OK", int(agree.sum()), agree.size)
"""
    )
    assert "DECODE_CHUNK_BF16_OK" in out
