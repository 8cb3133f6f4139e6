"""2D density estimation with a Householder rotation stage.

Port of /root/reference/examples/nf_example_2d.jl: ground truth
ScaleShift ∘ Householder ∘ CenterStretch; model from inverse-parameterized
stages; validated by cov(f(X)) ≈ I (reference :36-38).

Run: python examples/nf_example_2d.py
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
from enflows_tpu.train import optimize_whitening


def main():
    dt = jnp.float32
    vec = lambda *a: jnp.asarray(a, dt)

    f_true = ef.compose(
        ef.ScaleShift(a=vec(1.3, 0.4), b=vec(2.5, -1.2)),
        ef.Householder(V=vec(1.0, 0.3)),
        ef.CenterStretch(a=vec(4.0, 4.1), b=vec(2.0, 2.1),
                         c=vec(3.0, 3.1)),
    )
    XW = jax.random.normal(jax.random.PRNGKey(0), (10**5, 2), dt)
    X = f_true.forward(XW)

    model = ef.compose(
        ef.invert(ef.CenterStretch(a=vec(0.0, 0.0), b=vec(1.0, 1.0),
                                   c=vec(0.0, 0.0))),
        ef.invert(ef.Householder(
            V=jax.random.normal(jax.random.PRNGKey(1), (2,), dt))),
        ef.ScaleShift(a=vec(1.0, 1.0), b=vec(0.0, 0.0)),
    )

    res = optimize_whitening(X, model, optax.adagrad(0.1),
                             nbatches=1000, nepochs=10)

    XW2 = np.asarray(res.result.forward(X))
    cov = np.cov(XW2.T)
    print("cov(f(X)) =\n", cov.round(4))
    print("mean(f(X)) =", XW2.mean(0).round(4))
    ok = np.abs(cov - np.eye(2)).max() < 0.1 \
        and np.abs(XW2.mean(0)).max() < 0.1
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
