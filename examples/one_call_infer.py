"""One-call inference showcase: ef.infer() on warped 2D targets.

Three one-liners replace the hand-wired train/precondition/sample pipeline
(full_pipeline.py):

1. heavy-tailed unimodal target  -> auto VI transport + NUTS;
2. bimodal target with observed data -> whitening (mode-covering)
   transport fitted on the data + NUTS;
3. bimodal target, no data -> tempered SMC (+ log-normalizing constant).

Run: python examples/one_call_infer.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import enflows_tpu as ef


def main():
    v = lambda *a: jnp.asarray(a, jnp.float32)

    # 1. Heavy tails (Johnson warp): auto reverse-KL transport suffices.
    f1 = ef.compose(ef.ScaleShift(a=v(1.3, 0.4), b=v(2.5, -1.2)),
                    ef.Householder(V=v(1.0, 0.3)),
                    ef.JohnsonInv(gamma=v(0.5, -0.3), delta=v(2.0, 2.5),
                                  xi=v(0.0, 0.0), lam=v(1.0, 1.5)))
    t1 = ef.FlowDistribution(bijector=f1)
    r1 = ef.infer(lambda q: t1.logpdf(q), dim=2,
                  key=jax.random.PRNGKey(0), num_chains=8,
                  num_warmup=400, num_samples=500)
    d = r1.diagnostics
    print(f"[1] NUTS+auto: rhat={d['rhat'].max():.4f} "
          f"min_bulk_ess={d['min_bulk_ess']:.0f} "
          f"divergences={d['divergences']} mean={np.round(d['mean'], 3)}")

    # 2. Bimodal (CenterStretch pushes mass off-center) with observed
    # data: whitening transport is mode-covering where reverse-KL is not.
    f2 = ef.compose(ef.ScaleShift(a=v(1.3, 0.4), b=v(2.5, -1.2)),
                    ef.Householder(V=v(1.0, 0.3)),
                    ef.CenterStretch(a=v(4.0, 4.1), b=v(2.0, 2.1),
                                     c=v(3.0, 3.1)))
    t2 = ef.FlowDistribution(bijector=f2)
    X = t2.sample(jax.random.PRNGKey(9), (100_000,), dim=2)
    r2 = ef.infer(lambda q: t2.logpdf(q), dim=2,
                  key=jax.random.PRNGKey(1), data=X,
                  whiten_batches=200, whiten_epochs=8,
                  num_chains=8, num_warmup=400, num_samples=500)
    d2 = r2.diagnostics
    print(f"[2] NUTS+data-whitening: rhat={d2['rhat'].max():.4f} "
          f"mean={np.round(d2['mean'], 3)} "
          f"(data mean {np.round(np.asarray(X).mean(0), 3)})")

    # 3. Same bimodal target without data: SMC tempering crosses the
    # density hole and delivers log Z for free.
    r3 = ef.infer(lambda q: t2.logpdf(q), dim=2,
                  key=jax.random.PRNGKey(2), method="smc",
                  precondition=None, num_particles=16384)
    d3 = r3.diagnostics
    print(f"[3] SMC: logZ={d3['log_z']:.4f} (true 0.0) "
          f"weight_ess={d3['weight_ess']:.0f} "
          f"mean={np.round(d3['mean'], 3)}")


if __name__ == "__main__":
    main()
