"""On-TPU compiled Pallas attention vs XLA reference parity (run on a real
chip: plain `python scripts/tpu_kernel_parity.py`; the CPU suite covers
interpret mode only, and Mosaic lowering can diverge from interpret)."""
import numpy as np, jax, jax.numpy as jnp
from fluidaudio_tpu.ops.attention_pallas import relpos_attention, relpos_attention_reference
rng = np.random.RandomState(0)
B, H, T, Dh = 4, 8, 188, 128
f = lambda: jnp.asarray(rng.randn(B, H, T, Dh).astype(np.float32) * 0.3)
qu, qw, k, v = f(), f(), f(), f()
p = jnp.asarray(rng.randn(H, 2 * T - 1, Dh).astype(np.float32) * 0.3)
lengths = jnp.asarray([188, 100, 17, 188], jnp.int32)
got = np.asarray(relpos_attention(qu, qw, k, v, p, lengths, T))
bf = lambda x: x.astype(jnp.bfloat16).astype(jnp.float32)
ref = np.asarray(relpos_attention_reference(bf(qu), bf(qw), bf(k), bf(v), bf(p), lengths, T))
for b in range(B):
    L = int(lengths[b])
    d = np.abs(got[b, :, :L] - ref[b, :, :L])
    print(f"row {b} (len {L}): max abs diff {d.max():.4f}")
assert all(np.abs(got[b, :, :int(lengths[b])] - ref[b, :, :int(lengths[b])]).max() < 0.06 for b in range(B))
print("COMPILED KERNEL PARITY OK")
