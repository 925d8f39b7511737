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


@requires_tpu
def test_connected_components_compiled():
    """The on-device stats program (segmented min-scans + ordinal flood +
    bisection threshold) compiles and matches the CPU oracle on TPU."""
    out = _run_on_tpu(
        """
import numpy as np
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != "cpu", jax.devices()
from surya_tpu.ops import connected_components as cc

heat = np.zeros((2, 448, 224), np.float32)
for p in range(2):
    for i in range(40):
        heat[p, 5 + i*11 : 9 + i*11, 10:200] = 0.9
heat[1, 104:108, 10:200] = 0.0  # page variation: erase bar i=9 (rows 104:108)
stats, n, n_raw = jax.jit(lambda h: cc.component_stats(h, 0.3, max_comps=512))(jnp.asarray(heat))
stats, n = np.asarray(stats), np.asarray(n)
assert (np.asarray(n_raw) == n).all()
assert n[0] == 40 and n[1] == 39, n
row = stats[0, 0]
assert row[cc.AREA] == 4 * 190, row[cc.AREA]
assert row[cc.MIN_X] == 10 and row[cc.MAX_X] == 199
assert abs(row[cc.MAX_VAL] - 0.9) < 1e-3
top10 = np.asarray(cc.dynamic_threshold_inputs(jnp.asarray(heat)))
assert 0.1 < top10[0] < 0.95, top10
print("CC_COMPILED_OK")
"""
    )
    assert "CC_COMPILED_OK" in out


@requires_tpu
def test_detection_stats_path_e2e_on_tpu():
    """Full DetectionPredictor with the on-device stats postprocess vs the
    host CRAFT path on the real chip (tiny model, blob-hooked heat)."""
    out = _run_on_tpu(
        """
import numpy as np
import jax, jax.numpy as jnp
from PIL import Image, ImageDraw
assert jax.devices()[0].platform != "cpu", jax.devices()
from surya_tpu.detection import DetectionPredictor
from surya_tpu.models import efficientvit
from surya_tpu.settings import settings

det = DetectionPredictor(tiny=True)
efficientvit.install_blob_detector(det)

img = Image.new("RGB", (1000, 800), "white")
d = ImageDraw.Draw(img)
for i in range(8):
    d.rectangle((60, 50 + i * 90, 700, 70 + i * 90), fill="black")
settings.DETECTOR_ON_DEVICE_POSTPROCESS = True
dev = det([img])[0]
assert det._stats_skip == 0, "stats path fell back"
settings.DETECTOR_ON_DEVICE_POSTPROCESS = False
host = det([img])[0]
assert len(dev.bboxes) == len(host.bboxes) == 8, (len(dev.bboxes), len(host.bboxes))
print("STATS_E2E_OK")
"""
    , timeout=580)
    assert "STATS_E2E_OK" in out


@requires_tpu
def test_weight_quantized_decode_on_tpu():
    """int8-weight decoder runs compiled on TPU and tracks the bf16 path."""
    out = _run_on_tpu(
        """
import copy
import numpy as np
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != "cpu", jax.devices()
from surya_tpu.models import foundation, qwen_decoder, qwen_encoder

enc = qwen_encoder.EncoderConfig(depth=1, hidden_size=64, intermediate_size=128, num_heads=4,
                                 window_size=56, out_hidden_size=256, fullatt_block_indexes=())
dec = qwen_decoder.DecoderConfig(vocab_size=256, hidden_size=256, intermediate_size=512,
                                 num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4)
cfg = foundation.FoundationConfig(vocab_size=256, encoder=enc, decoder=dec)
params = foundation.init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.bfloat16)
params_q = copy.deepcopy(params)
params_q["decoder"] = qwen_decoder.quantize_weights(params_q["decoder"])

tokens = jnp.asarray(np.arange(4, dtype=np.int32) + 5)
active = jnp.ones(4, bool)
prompt = jnp.asarray(np.tile(np.array([[3, 4, 5]], np.int32), (4, 1)))
lens = jnp.asarray(np.full(4, 3, np.int32))

def run(p):
    cache = qwen_decoder.init_cache(dec, 4, 64, jnp.bfloat16)
    embeds = foundation.embed_prompt_tokens(p, cfg, prompt, jnp.full((4, 3), -1, jnp.int32), jnp.zeros((1, 256), jnp.bfloat16))
    nk, nv, _ = qwen_decoder.prefill(p["decoder"], dec, embeds, lens)
    cache = qwen_decoder.merge_prefill(cache, nk, nv, lens, jnp.arange(4))
    _, toks, scores, *_ = foundation.decode_chunk(p, cfg, cache, tokens, active, num_steps=8)
    return np.asarray(toks), np.asarray(scores)

tf, sf = run(params)
tq, sq = run(params_q)
match = (tf == tq).mean()
assert match > 0.9, match  # bf16 + int8 drift may flip rare near-ties
print("WQ_DECODE_OK")
"""
    )
    assert "WQ_DECODE_OK" in out
