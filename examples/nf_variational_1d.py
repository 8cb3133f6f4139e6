"""Flow-based variational inference against a 1D Gaussian mixture.

Port of /root/reference/examples/nf_variational_1d.jl: negative-ELBO
training of a 4-stage transport with antithetic sampling (reference :57),
validated by pushing 10^5 base samples through the learned transport and
comparing moments against the analytic mixture (the reference overlays
histograms; :81-90). The entropy term uses the event dimension — the
corrected form (see SURVEY.md §2a note on the reference's axis confusion).

Run: python examples/nf_variational_1d.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

import enflows_tpu as ef
from enflows_tpu.train import optimize_elbo


def main():
    dt = jnp.float32
    vec = lambda *a: jnp.asarray(a, dt)

    def my_ll(z):
        z = z[..., 0]
        comps = jnp.stack([
            jnp.log(0.3) + ef.std_normal_logpdf(z - 2.0),
            jnp.log(0.5) + ef.std_normal_logpdf(z - 5.0),
            jnp.log(0.2) + ef.std_normal_logpdf(z + 1.0),
        ], axis=-1)
        return jax.scipy.special.logsumexp(comps, axis=-1)

    fwd = ef.compose(
        ef.Johnson(gamma=vec(0.0), delta=vec(5.0), xi=vec(0.0), lam=vec(5.0)),
        ef.invert(ef.CenterStretch(a=vec(0.0), b=vec(1.0), c=vec(0.0))),
        ef.Johnson(gamma=vec(0.0), delta=vec(5.0), xi=vec(0.0), lam=vec(5.0)),
        ef.invert(ef.CenterStretch(a=vec(0.0), b=vec(1.0), c=vec(0.0))),
    )
    model = ef.invert(fwd)      # reference :73

    res = optimize_elbo(my_ll, model, optax.adagrad(0.1), dim=1,
                        batch_size=100, nsteps=1000,
                        key=jax.random.PRNGKey(0), dtype=dt)

    z = np.asarray(res.result.forward(
        jax.random.normal(jax.random.PRNGKey(1), (10**5, 1), dt)))[:, 0]
    mean_true = 0.3 * 2 + 0.5 * 5 + 0.2 * (-1)
    var_true = (0.3 * 5 + 0.5 * 26 + 0.2 * 2) - mean_true**2
    print(f"nELBO: {float(res.nelbo_history[0]):.3f} -> "
          f"{float(np.mean(np.asarray(res.nelbo_history[-50:]))):.3f} "
          f"(0 = perfect fit, mixture is normalized)")
    print(f"pushforward mean {z.mean():.3f} (true {mean_true}), "
          f"var {z.var():.3f} (true {var_true:.2f})")
    ok = abs(z.mean() - mean_true) < 0.3 and abs(z.var() - var_true) < 1.5
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
