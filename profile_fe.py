import time, numpy as np, jax, jax.numpy as jnp
from ppg_slam_tpu.geometry.cameras import CAM_PINHOLE, CameraModel
from ppg_slam_tpu.frontend import PPGExtractor
from ppg_slam_tpu.models import load_params, ppg_forward
from ppg_slam_tpu.ops.nms import nms_keypoints
from ppg_slam_tpu.ops.heatmap import refine_heatmap, remap_heatmap
from ppg_slam_tpu.ops.lines import pair_probe_mask
from ppg_slam_tpu.ops.descriptors import sample_descriptors

cam = CameraModel(kind=CAM_PINHOLE, fx=458.654, fy=457.296, cx=367.215, cy=248.375,
    dist=(-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05), width=752, height=480)
params = load_params()
rng = np.random.RandomState(0)
img = np.full((480,752),120,np.uint8)
for i in range(1,10): img[i*48-1,:]=250
for j in range(1,15): img[:,j*50-1]=250
img = np.clip(img.astype(np.int32)+rng.randint(-20,20,img.shape),0,255).astype(np.uint8)

def timeit(fn, n=20):
    jax.block_until_ready(fn())
    t0=time.perf_counter()
    for _ in range(n): jax.block_until_ready(fn())
    return round((time.perf_counter()-t0)/n*1e3, 2)

x = jnp.asarray(img).astype(jnp.float32)[None,:,:,None]/255.0
fwd = jax.jit(lambda p, x: ppg_forward(p, x))
print("nets fwd:", timeit(lambda: fwd(params, x)))

out = jax.block_until_ready(fwd(params, x))
junc = out["junc_prob"][0]; heat0 = out["heat"][0]; dmap = out["desc"][0]
print("nms:", timeit(lambda: nms_keypoints(junc)))
kp_xy, kp_score, kp_valid = jax.block_until_ready(nms_keypoints(junc))
kp_pos = kp_xy.astype(jnp.float32)
und = jax.jit(cam.undistort_points)
print("undistort:", timeit(lambda: und(kp_pos)))
kp_un = jax.block_until_ready(und(kp_pos))
print("refine:", timeit(lambda: refine_heatmap(heat0)))
heat1 = jax.block_until_ready(refine_heatmap(heat0))
remap_xy = jnp.asarray(cam.undistort_rectify_map())
rem = jax.jit(remap_heatmap)
print("remap:", timeit(lambda: rem(heat1, remap_xy)))
heat = jax.block_until_ready(rem(heat1, remap_xy))
print("pair_probe:", timeit(lambda: pair_probe_mask(heat, kp_un, kp_valid)))
sd = jax.jit(lambda d,p,v: sample_descriptors(d,p,v,752,480))
print("desc sample:", timeit(lambda: sd(dmap, kp_pos, kp_valid)))
