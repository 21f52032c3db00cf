import sys, time
sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))
import jax, numpy as np, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from articulation3d_tpu.ops.roi_align import multilevel_roi_align
from articulation3d_tpu.ops.roi_align_pallas import multilevel_roi_align_pallas

dev = jax.devices()[0]
rs = np.random.RandomState(0)
B, N = 2, 64
feats = [jnp.asarray(rs.randn(B, h, w, 256), jnp.float32)
         for h, w in [(120,160),(60,80),(30,40),(15,20)]]
# boxes of mixed sizes, valid geometry
sizes = rs.uniform(20, 500, (B, N, 1))
x1 = rs.uniform(0, 600, (B, N, 1)); y1 = rs.uniform(0, 440, (B, N, 1))
boxes = np.concatenate([x1, y1, np.minimum(x1+sizes, 640), np.minimum(y1+sizes*0.8, 480)], axis=2).astype(np.float32)
boxes = jnp.asarray(boxes)

for sr, aligned, p in [(0, True, 7), (0, False, 14), (2, False, 14)]:
    ref = jax.jit(lambda fs, bx: jax.vmap(lambda f2,f3,f4,f5,b: multilevel_roi_align(
        [f2,f3,f4,f5], b, strides=(4,8,16,32), output_size=p,
        sampling_ratio=sr, aligned=aligned))(fs[0],fs[1],fs[2],fs[3],bx))(feats, boxes)
    got = jax.jit(lambda fs, bx: multilevel_roi_align_pallas(
        fs, bx, strides=(4,8,16,32), output_size=p,
        sampling_ratio=sr, aligned=aligned))(feats, boxes)
    ref = np.asarray(ref); got = np.asarray(got)
    err = np.abs(ref - got).max()
    print(f"sr={sr} aligned={aligned} P={p}: max|err| = {err:.2e}", flush=True)

# perf
boxes_big = jnp.asarray(rs.uniform(0, 400, (8, 1000, 4)).astype(np.float32)).sort(axis=-1)
feats8 = [jnp.asarray(rs.randn(8, h, w, 256), jnp.float32)
          for h, w in [(120,160),(60,80),(30,40),(15,20)]]
f = jax.jit(lambda fs, bx: multilevel_roi_align_pallas(
    fs, bx, strides=(4,8,16,32), output_size=7, sampling_ratio=0, aligned=True).sum())
s = float(f(feats8, boxes_big)); t0=time.time()
for _ in range(5): s += float(f(feats8, boxes_big))
print(f"pallas box-pool 8x1000 7x7 f32: {(time.time()-t0)/5*1000:.1f} ms/step", flush=True)

feats8_bf = [x.astype(jnp.bfloat16) for x in feats8]
s = float(f(feats8_bf, boxes_big)); t0=time.time()
for _ in range(5): s += float(f(feats8_bf, boxes_big))
print(f"pallas box-pool 8x1000 7x7 bf16: {(time.time()-t0)/5*1000:.1f} ms/step", flush=True)
