"""Conditional structure with coupling flows: the banana target.

The elementwise+rotation families (the reference's bijector algebra)
express "orthogonal rotation of independently warped marginals" — they
cannot whiten a target whose second coordinate depends NONLINEARLY on
the first. The banana density

    x1 ~ N(0, 1),     x2 | x1 ~ N(0.5 * x1^2 - 1, 0.3^2)

is the canonical example. This script shows the coupling tier handling
it end to end, the mode-covering way:

1. observe draws from the banana and fit a coupling-stack WHITENING flow
   by maximum likelihood (``optimize_whitening`` — forward KL, so the
   fit covers the whole ridge; the mode-seeking VI direction can trap
   samplers on curved targets, see ``infer``'s docstring);
2. verify the conditional structure is captured: cov of the whitened
   data is the identity AND both whitened coordinates are marginally
   standard normal;
3. hand the same data to ``infer(data=...)`` with the coupling template:
   it refits the whitening transport and samples the preconditioned
   banana with NUTS — posterior moments match the data.

On TPU the stack evaluates through the fused whole-stack Pallas kernel
(ops/pallas/coupling.py; BASELINE.md "Coupling tier") in the trainer's
auto-dispatched hot loop.

Run: python examples/coupling_conditional_2d.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import enflows_tpu as ef
from enflows_tpu.train import optimize_whitening


def banana_logp(q):
    x1, x2 = q[..., 0], q[..., 1]
    mu2 = 0.5 * x1 ** 2 - 1.0
    return (-0.5 * x1 ** 2
            - 0.5 * ((x2 - mu2) / 0.3) ** 2)


def banana_draws(key, n):
    k1, k2 = jax.random.split(key)
    x1 = jax.random.normal(k1, (n,), jnp.float32)
    x2 = 0.5 * x1 ** 2 - 1.0 + 0.3 * jax.random.normal(k2, (n,),
                                                       jnp.float32)
    return jnp.stack([x1, x2], axis=-1)


def main():
    key = jax.random.PRNGKey(0)
    X = banana_draws(key, 60_000)

    # 1. Coupling-stack whitening (identity-initialized; reversal
    #    permutes give both coordinates a conditioning turn).
    stack = ef.coupling_stack(jax.random.fold_in(key, 1), 2,
                              n_layers=6, hidden=(48, 48))
    fit = optimize_whitening(X, stack, optax.adam(2e-3),
                             nbatches=30, nepochs=60)
    Y = np.asarray(fit.result.forward(X))

    C = np.cov(Y, rowvar=False)
    q = np.quantile(Y, [0.159, 0.841], axis=0)   # +-1 sigma quantiles
    print(f"whitened cov       : [[{C[0,0]:.3f} {C[0,1]:+.3f}] "
          f"[{C[1,0]:+.3f} {C[1,1]:.3f}]] (want I)")
    print(f"whitened +-1sd qts : {q[0].round(2)} / {q[1].round(2)} "
          f"(want ~[-1 -1] / [1 1])")
    white_ok = (np.abs(C - np.eye(2)).max() < 0.15
                and np.abs(np.abs(q) - 1.0).max() < 0.25)

    # 2. One-call inference with the data-driven (mode-covering)
    #    preconditioner: infer refits the coupling whitening on X and
    #    samples the preconditioned banana with NUTS.
    result = ef.infer(
        banana_logp, dim=2, key=jax.random.fold_in(key, 2),
        method="nuts", num_chains=32, num_warmup=400, num_samples=600,
        data=X, flow_template=ef.coupling_flow_template(6, (48, 48)),
        whiten_batches=30, whiten_epochs=60)

    draws = np.asarray(result.draws).reshape(-1, 2)
    x1, x2 = draws[:, 0], draws[:, 1]
    resid = (x2 - 0.5 * x1 ** 2 + 1.0) / 0.3
    print(f"rhat max           : {result.diagnostics['rhat'].max():.4f}")
    print(f"min bulk ESS       : {result.diagnostics['min_bulk_ess']:.0f}")
    print(f"x1 mean/sd         : {x1.mean():+.3f} / {x1.std():.3f} "
          f"(want 0 / 1)")
    print(f"conditional resid  : {resid.mean():+.3f} / {resid.std():.3f} "
          f"(want 0 / 1)")
    samp_ok = (abs(x1.mean()) < 0.15 and abs(x1.std() - 1.0) < 0.2
               and abs(resid.mean()) < 0.2
               and abs(resid.std() - 1.0) < 0.3)

    ok = white_ok and samp_ok
    print("PASS" if ok else
          f"FAIL (whitening {'ok' if white_ok else 'BAD'}, "
          f"sampling {'ok' if samp_ok else 'BAD'})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
