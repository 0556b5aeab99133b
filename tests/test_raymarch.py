import functools

import numpy as np
import jax
import jax.numpy as jnp

from volren_tpu.ops import raymarch as RM
from volren_tpu.ops import rng as R
from volren_tpu.ops import scene as dscene
from volren_tpu.ops.scene import SceneDevice, TraceConfig
from volren_tpu.scene.transferfunc import TransferFunction

from test_tracking import make_scene, seeds, CFG


def test_raymarch_transmittance_constant_density():
    sigma = 0.3
    dense = np.full((16, 16, 16), sigma, np.float32)
    dense[0, 0, 0] = sigma * 1.0001
    scene, params = make_scene(dense)
    n = 20000
    org = jnp.tile(jnp.array([[-5.0, 8.0, 8.0]]), (n, 1))
    d = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (n, 1))
    f = jax.jit(functools.partial(RM.transmittance_raymarch, cfg=CFG))
    tr, _ = f(scene, params, org=org, direction=d, seed=seeds(n), active=jnp.ones(n, bool))
    got = float(np.asarray(tr).mean())
    assert abs(got - np.exp(-sigma * 16)) < 0.01


def test_dvr_constant_volume_closed_form():
    """Constant density + constant white TF: L = c*(1-exp(-tau)), plus
    env*Tr background."""
    sigma = 0.25
    dense = np.full((16, 16, 16), sigma, np.float32)
    dense[0, 0, 0] = sigma * 1.0001
    scene, params = make_scene(dense)
    tf = TransferFunction([(1.0, 1.0, 1.0, 1.0), (1.0, 1.0, 1.0, 1.0)])
    scene = scene._replace(tf=dscene.upload_transferfunc(tf))
    cfg = TraceConfig(use_dda=False, use_tf=True, has_emission=False)
    n = 4096
    org = jnp.tile(jnp.array([[-5.0, 8.0, 8.0]]), (n, 1))
    d = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (n, 1))
    f = jax.jit(functools.partial(RM.direct_volume_rendering, cfg=cfg))
    radiance, _ = f(scene, params, org=org, direction=d, seed=seeds(n, 2), active=jnp.ones(n, bool))
    got = float(np.asarray(radiance)[:, 0].mean())
    # the reference integrates with a left Riemann sum over 64 steps
    # (common.glsl:583-588) — match its discrete value, not the continuum
    maj = float(params.majorant)
    dtau = maj * 16.0 / RM.RAYMARCH_STEPS
    expect = dtau * (1 - np.exp(-RM.RAYMARCH_STEPS * dtau)) / (1 - np.exp(-dtau))
    assert abs(got - expect) < 0.02
