"""Library smoke drive (see .claude/skills/verify): sRGB -> unprocess -> 5-stage render -> agent rollout, with probes."""
"""End-to-end drive of the adaptiveisp_tpu public API (CPU)."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import sys; sys.path.insert(0, ".")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from adaptiveisp_tpu import Config
from adaptiveisp_tpu.raw import unprocess as U
from adaptiveisp_tpu.ops import bank
from adaptiveisp_tpu.policy.agent import create_agent_state
from adaptiveisp_tpu.policy.states import get_initial_states

cfg = Config()
rng = np.random.RandomState(0)

# 1) synthesize a RAW image from a synthetic sRGB scene (gradient + shapes)
h = w = 128
yy, xx = np.mgrid[0:h, 0:w] / h
srgb = np.stack([yy, xx, 0.5 + 0.4*np.sin(8*yy)], -1).astype(np.float32)
raw, meta = U.unprocess_wo_mosaic(jax.random.PRNGKey(1), jnp.asarray(srgb))
print("RAW synth: mean srgb=%.3f -> raw=%.3f  gains(R=%.2f,B=%.2f)" %
      (srgb.mean(), np.asarray(raw).mean(), float(meta.red_gain), float(meta.blue_gain)))

# 2) scripted 5-stage ISP render (the BASELINE.md config-1 pipeline)
img = jnp.asarray(raw)[None]
stages = [
    ("exposure", jnp.asarray([[1.2]], jnp.float32)),
    ("improved_wb", jnp.asarray([[2.40, 1.22, 1.88]], jnp.float32)),
    ("ccm", jnp.asarray(np.eye(3, dtype=np.float32).reshape(1, 9) * 1.2)),
    ("gamma", jnp.asarray([[0.45]], jnp.float32)),
    ("sharpen", jnp.asarray([[3.0]], jnp.float32)),
]
out = bank.render_pipeline(cfg, img, stages)
print("5-stage render: in mean=%.3f -> out mean=%.3f, range [%.3f, %.3f]" %
      (float(img.mean()), float(out.mean()), float(out.min()), float(out.max())))
assert float(out.mean()) > float(img.mean()), "render should brighten the dark RAW"

# 3) adaptive policy step on the RAW through the Agent (eval mode)
model, variables = create_agent_state(cfg, jax.random.PRNGKey(0), image_size=128, batch=1)
z = jnp.asarray(rng.uniform(0, 1, (1, cfg.z_dim)).astype(np.float32))
states = jnp.asarray(get_initial_states(1, cfg.num_state_dim))
retouched = img
for step in range(cfg.test_steps):
    retouched, states, surr, pen, _, info = model.apply(
        variables, retouched, z, states, 1.0, train=False)
    sel = int(info["selected_filter"][0])
    print("  step %d: filter=%s pdf_max=%.3f penalty=%.4f stopped=%d" %
          (step, cfg.filters[sel], float(info["pdf"].max()), float(pen[0,0]),
           int(states[0,1])))
    if float(states[0, 1]) > 0:
        break
print("rollout done: final mean=%.4f, states=%s" % (float(retouched.mean()), np.asarray(states[0,:3])))

# probes
try:
    bank.render_fixed(cfg, img, "nonexistent", jnp.zeros((1,1)))
    print("PROBE FAIL: bad filter name accepted")
except KeyError as e:
    print("PROBE ok: bad filter name -> KeyError", e)

out2 = bank.render_pipeline(cfg, jnp.asarray(srgb)[None] * 3.0, stages)  # out-of-range input
print("PROBE out-of-range input -> output range [%.3f, %.3f] (finite=%s)" %
      (float(out2.min()), float(out2.max()), bool(np.isfinite(np.asarray(out2)).all())))
