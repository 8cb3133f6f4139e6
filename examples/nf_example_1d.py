"""1D density estimation by maximum-likelihood whitening.

Port of /root/reference/examples/nf_example_1d.jl: a ground-truth
CenterStretch ∘ Johnson flow warps N(0,1) into a heavy-tailed 1D target;
a 4-stage flow is fit from identity-ish init with ADAGrad (100 batches x
10 epochs over 10^5 samples) and validated against the analytic negll
reference lines and pushforward statistics (histograms in the reference;
quantile comparison here — no plotting dependency).

Run: python examples/nf_example_1d.py
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
from enflows_tpu.train import optimize_whitening, mvnormal_negll


def main():
    dt = jnp.float32
    vec = lambda *a: jnp.asarray(a, dt)

    # Ground truth (reference :8-15).
    f_true = ef.compose(
        ef.CenterStretch(a=vec(4.0), b=vec(1.0), c=vec(0.0)),
        ef.Johnson(gamma=vec(10.0), delta=vec(3.5), xi=vec(10.0),
                   lam=vec(1.0)),
    )
    XW = jax.random.normal(jax.random.PRNGKey(0), (10**5, 1), dt)
    X = f_true.forward(XW)

    # 4-stage model from identity-ish init (reference :19-23).
    model = ef.compose(
        ef.Johnson(gamma=vec(0.0), delta=vec(5.0), xi=vec(0.0), lam=vec(5.0)),
        ef.invert(ef.CenterStretch(a=vec(0.0), b=vec(1.0), c=vec(0.0))),
        ef.Johnson(gamma=vec(0.0), delta=vec(5.0), xi=vec(0.0), lam=vec(5.0)),
        ef.invert(ef.CenterStretch(a=vec(0.0), b=vec(1.0), c=vec(0.0))),
    )

    res = optimize_whitening(X, model, optax.adagrad(0.1),
                             nbatches=100, nepochs=10)

    # Validation (reference :33-44): negll vs analytic reference line.
    target_negll = float(mvnormal_negll(ef.invert(f_true), X))
    final_negll = float(np.mean(np.asarray(res.negll_history[-100:])))
    XW2 = res.result.forward(X)
    qs = [5, 25, 50, 75, 95]
    q_model = np.percentile(np.asarray(XW2), qs)
    q_base = np.percentile(np.asarray(XW), qs)

    print(f"negll: initial {float(res.negll_history[0]):.4f} -> "
          f"final {final_negll:.4f} (analytic target {target_negll:.4f})")
    print(f"whitened quantiles {qs}: {q_model.round(3)}")
    print(f"  N(0,1) quantiles       : {q_base.round(3)}")
    # Central quantiles tight; 5/95% tails looser (1,000 ADAGrad steps —
    # the reference workload — leaves visible tail slack in the overlay).
    ok = final_negll < target_negll + 0.05 \
        and np.abs(q_model[1:4] - q_base[1:4]).max() < 0.12 \
        and np.abs(q_model - q_base).max() < 0.3
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
