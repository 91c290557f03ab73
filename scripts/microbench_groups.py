"""Isolate where a fused group dispatch's ~300 ms goes, at real cat
bucket shapes, on the real chip.  Times each sub-program blocked with
fresh args (tunnel replay-proof)."""
import sys, time
sys.path.insert(0, "/root/repo")
from mods_tpu.runtime import setup_cache
setup_cache()
import jax, jax.numpy as jnp, numpy as np
from mods_tpu.config import CapacityParams
from mods_tpu.pipeline import EngineConfig, _render_program, \
    _split_detect_program, _desc_program, _fused_group_program

cfg = EngineConfig()
caps = cfg.caps
rng = np.random.default_rng(0)

def timeit(name, fn, args_fn, n=7):
    out = fn(*args_fn(0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        out = fn(*args_fn(i))
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:<42}{dt:9.1f} ms", flush=True)
    return out

# shapes: a tilt-2 style group on the cat bucket
V, h0, w0 = 8, 1000, 598
hr, wr = 1280, 1280
hc, wc = 640, 1280
img_host = rng.uniform(0, 255, (h0, w0)).astype(np.float32)
rot_inv = np.tile(np.asarray([[1, 0, 0], [0, 1, 0]], np.float32), (V, 1, 1))
squash = np.asarray([[1, 0, 0], [0, 0.5, 0]], np.float32)
valid = np.tile(np.asarray([[500, 1196]], np.int32), (V, 1))
valid = np.minimum(valid, [hc, wc])
hinv = np.tile(np.asarray([[1, 0, 0], [0, 2, 0]], np.float32), (V, 1, 1))

imgs = [jnp.asarray(img_host + i) for i in range(8)]
jax.block_until_ready(imgs)
rot_d = jnp.asarray(rot_inv); sq_d = jnp.asarray(squash)
val_d = jnp.asarray(valid); hinv_d = jnp.asarray(hinv)
sx = jnp.float32(0.8); sy = jnp.float32(1.6)

# 1. arg-overhead probe: big args, trivial compute
@jax.jit
def trivial(img, rot, sq, a, b, v, hv):
    return img[0, 0] + rot[0, 0, 0] + v[0, 0]
timeit("trivial prog w/ big args", trivial,
       lambda i: (imgs[i % 8], rot_d, sq_d, sx, sy, val_d, hinv_d))

# 2. render program (rot warp + AA blur + squash warp + clamp_pad)
rp = _render_program(V, h0, w0, hr, wr, hc, wc, True, False)
views = timeit("render (warp+blur+warp+pad)", rp,
               lambda i: (imgs[i % 8], rot_d, sq_d, sx, sy, val_d))

# 2b. identity render
rpi = _render_program(1, h0, w0, 0, 0, 1024, 640, False, True)
timeit("render identity (pad only)", rpi,
       lambda i: (imgs[i % 8], jnp.asarray(rot_inv[:1]), sq_d, sx, sy,
                  jnp.asarray([[h0, w0]], np.int32)))

views = jax.block_until_ready(views)
views_set = [jax.block_until_ready(views + i) for i in range(8)]

# 3. detect program (scale-space + Baumberg) on rendered views
dp = _split_detect_program(V, hc, wc, "HessianAffine", cfg)
regn = jnp.full((V,), 10**9, jnp.int32)
regs = timeit("detect hessaff (pyr+nms+baumberg)", dp,
              lambda i: (views_set[i % 8], val_d, regn))

# 4. describe program on rendered views + detections
from mods_tpu.descriptors.registry import get_spec
pe = cfg.sift.patch_extraction
ddp = _desc_program(V, hc, wc, h0, w0, regs.capacity, ("RootSIFT",),
                    cfg.dom_ori, pe.mr_size, pe.patch_size, pe.photo_norm,
                    caps)
def mk_store():
    return ((jnp.zeros((caps.per_image, 2)), jnp.zeros((caps.per_image, 2, 2)),
             jnp.zeros((caps.per_image,)), jnp.zeros((caps.per_image,)),
             jnp.zeros((caps.per_image, 128)), jnp.zeros((), jnp.int32)),)
timeit("describe (mips+orient+patches+sift)", ddp,
       lambda i: (views_set[i % 8], val_d, regs.xy, regs.A, regs.s,
                  regs.response, regs.mask, hinv_d, mk_store()))

# 5. whole fused group program
fp = _fused_group_program(V, h0, w0, hr, wr, hc, wc, True, False,
                          "HessianAffine", ("RootSIFT",), cfg)
timeit("fused group (all of the above)", fp,
       lambda i: (imgs[i % 8], rot_d, sq_d, sx, sy, val_d, regn, hinv_d,
                  mk_store()))
