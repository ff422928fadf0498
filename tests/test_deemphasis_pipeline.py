"""De-emphasis option end to end through the receiver."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal

from rtsdr_tpu.config import MODE0
from rtsdr_tpu.ops.iir import deemphasis_coeffs
from rtsdr_tpu.pipeline.receiver import make_receiver

from oracles import synth_multiplex_iq


def test_receiver_deemphasis_equals_post_filter():
    """deemphasis=tau inside the receiver == lfilter on the plain output."""
    iq = synth_multiplex_iq(2 * MODE0.block_size // 2)
    bs = MODE0.block_size

    def run(**kw):
        init_fn, step_fn = make_receiver(MODE0, dtype=jnp.float64,
                                         enable_rds=False, **kw)
        state = init_fn()
        step = jax.jit(step_fn)
        l = []
        for b in range(2):
            state, out = step(state, jnp.asarray(iq[b * bs:(b + 1) * bs]))
            l.append(np.asarray(out.left))
        return np.concatenate(l)

    plain = run()
    de = run(deemphasis=75e-6)
    b, a = deemphasis_coeffs(48e3, 75e-6)
    ref = signal.lfilter([b], [1.0, -a], plain)
    np.testing.assert_allclose(de, ref, rtol=1e-9, atol=1e-10)
