"""Profile server-style decode step (per-row scatter writes) vs static step."""
import glob, json, tempfile, collections
import jax, jax.numpy as jnp
import bench_suite

cfg, model, params = bench_suite._lm_model(use_flash=False)
B, S = 8, 512

def op_breakdown(fn, args_list, trace_dir, calls):
  with jax.profiler.trace(trace_dir):
    out = None
    for a in args_list:
      out = fn(*a)
    jax.block_until_ready(out)
  from jax.profiler import ProfileData
  path = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))[-1]
  pd = ProfileData.from_file(path)
  per_op = collections.Counter()
  total = 0.0
  for plane in pd.planes:
    if "TPU" not in plane.name:
      continue
    for line in plane.lines:
      if line.name != "XLA Ops":
        continue
      for ev in line.events:
        dur = ev.duration_ns / 1e3
        per_op[ev.name] += dur
        total += dur
  return total / calls, per_op

# static-style: scalar cache_index
cache0 = model.init_cache(B, S)
# warm the cache with a prefill of 128
toks = jax.random.randint(jax.random.key(0), (B, 128), 0, cfg.vocab_size)
pos = jnp.broadcast_to(jnp.arange(128)[None], (B, 128))
_, cache0 = jax.jit(lambda p, t: model(p, t, positions=pos, cache=cache0, cache_index=0))(params, toks)

kv_pos = jnp.broadcast_to(jnp.arange(S)[None], (B, S))

@jax.jit
def static_step(params, cache, tok, idx):
  logits, cache = model(params, tok[:, None],
                        positions=jnp.full((B, 1), idx, jnp.int32),
                        cache=cache, cache_index=idx, kv_positions=kv_pos)
  return jnp.argmax(logits[:, 0], -1).astype(jnp.int32), cache

@jax.jit
def server_step(params, cache, tok, lengths, active):
  pos = lengths[:, None].astype(jnp.int32)
  write_idx = jnp.where(active, lengths, S)
  logits, cache = model(params, tok[:, None], positions=pos,
                        cache=cache, cache_index=write_idx,
                        kv_positions=kv_pos)
  return jnp.argmax(logits[:, 0], -1).astype(jnp.int32), cache

tok = jnp.ones((B,), jnp.int32)
lengths = jnp.full((B,), 200, jnp.int32)
active = jnp.ones((B,), bool)

t, c = static_step(params, cache0, tok, 200); jax.block_until_ready(c)
t, c = server_step(params, cache0, tok, lengths, active); jax.block_until_ready(c)

N = 16
with tempfile.TemporaryDirectory() as d:
  ms_s, ops_s = op_breakdown(lambda p, cc: static_step(p, cc, tok, 200),
                             [(params, cache0)] * N, d, N)
with tempfile.TemporaryDirectory() as d:
  ms_v, ops_v = op_breakdown(lambda p, cc: server_step(p, cc, tok, lengths, active),
                             [(params, cache0)] * N, d, N)

print(f"static step: {ms_s/1e3:.3f} ms   server step: {ms_v/1e3:.3f} ms  premium {ms_v/ms_s:.2f}x")
print("--- top static ops (us/call) ---")
for k, v in ops_s.most_common(10):
  print(f"{v/N:9.1f}  {k[:90]}")
print("--- top server ops (us/call) ---")
for k, v in ops_v.most_common(14):
  print(f"{v/N:9.1f}  {k[:90]}")
