"""Front-end profiler on the current backend (run on TPU): sync latency +
pipelined throughput."""
import time, numpy as np, jax
from ppg_slam_tpu.geometry.cameras import CAM_PINHOLE, CameraModel
from ppg_slam_tpu.frontend import PPGExtractor

cam = CameraModel(kind=CAM_PINHOLE, fx=458.654, fy=457.296, cx=367.215, cy=248.375,
    dist=(-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05), width=752, height=480)
ex = PPGExtractor(cam)
rng = np.random.RandomState(0)
frames=[]
for k in range(16):
    img = np.full((480,752),120,np.uint8)
    for i in range(1,10): img[i*48-1,:]=250
    for j in range(1,15): img[:,j*50-1]=250
    img = np.clip(img.astype(np.int32)+rng.randint(-20,20,img.shape),0,255).astype(np.uint8)
    frames.append(img)
t0=time.perf_counter()
f0 = ex.extract(frames[0])
print(f"first extract (compile): {time.perf_counter()-t0:.1f}s  kp={f0.n_kp} edges={len(f0.edges)} colines={len(f0.colines)}")

# sync latency
ts=[]
for i in range(12):
    t0=time.perf_counter(); ex.extract(frames[i%16]); ts.append(time.perf_counter()-t0)
print("sync extract ms (med):", round(np.median(ts)*1e3,1))

# pipelined throughput, depth 6
for depth in (2, 4, 8):
    n = 32
    t0=time.perf_counter()
    pending = []
    results = 0
    for i in range(n):
        pending.append(ex.extract_async(frames[i%16]))
        if len(pending) >= depth:
            pending.pop(0).result(); results += 1
    while pending:
        pending.pop(0).result(); results += 1
    dt = (time.perf_counter()-t0)/n*1e3
    print(f"pipelined depth={depth}: {dt:.1f} ms/frame")

# host finish cost alone
a = jax.device_get(ex.extract_async(frames[0])._out)
t0=time.perf_counter()
for _ in range(20): ex._finish(a)
print("host finish ms:", round((time.perf_counter()-t0)/20*1e3,2))
