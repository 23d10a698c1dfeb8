"""Per-stage KF profiling harness (device platform as configured)."""
import time, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from sos_slam_tpu.models import energy as E, full_system as FS
from sos_slam_tpu.utils import synthetic
from sos_slam_tpu.utils.config import default_settings
import sos_slam_tpu.models.full_system as fsm
import sos_slam_tpu.models.window as W
import sos_slam_tpu.ops.tracker as TK

def timed(mod, name, get_leaf=None):
    fn = getattr(mod, name)
    def wrapped(*a, **k):
        t0 = time.time()
        out = fn(*a, **k)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        dt = (time.time()-t0)*1000
        if dt > 100:
            print(f"    {name}: {dt:.0f} ms", flush=True)
        return out
    setattr(mod, name, wrapped)

for n in ["_kf_mega_jit","_marg_select_jit","_frame_step_jit","_kf_core_jit","_activate_jit","_marg_points_jit","_marg_frame_jit","_select_insert_jit","_trace_stats_jit","_insert_frame_jit","_hdif_jit","_activation_jit","_insert_activated_jit","_insert_new_traces_jit",
          "_trace_jit","_frame_stats_jit","_flag_points_jit","_pre_marg_jit",
          "_frame_residual_energy"]:
    timed(fsm, n)
timed(E, "optimize")
timed(E, "marginalize_points")
timed(E, "marginalize_frame")
timed(W, "build_track_template")
timed(TK, "track_hypotheses")
timed(TK, "track_newest_coarse")
import sos_slam_tpu.ops.image as IMG
timed(IMG, "build_pyramid")
import sos_slam_tpu.ops.selector as SEL
timed(SEL, "select")
timed(SEL, "block_thresholds")

W2, H2 = 640, 480
calib = synthetic.default_calib(W2, H2)
settings = default_settings()
twist = jnp.array([0.03, 0.012, 0.02, 0.002, 0.004, 0.001])
n = int(os.environ.get("N_FRAMES", "40"))
imgs, _, poses = synthetic.make_sequence(calib, n, twist, plane_z=2.0)
imgs = jax.block_until_ready(imgs)
fs = FS.FullSystem(calib, settings)
for i in range(n):
    t0 = time.time()
    fs.add_active_frame(imgs[i], timestamp=i*0.05, frame_id=i)
    jax.block_until_ready(fs.ba.state)
    print(f"frame {i}: {(time.time()-t0)*1000:.0f} ms kf={fs.stats['n_kf']}", flush=True)
    if fs.is_lost or fs.init_failed:
        break
print("done", flush=True)
