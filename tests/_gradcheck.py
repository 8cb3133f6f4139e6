"""Finite-difference gradient checking (jax.test_util was removed in 0.9)."""
import jax
import jax.numpy as jnp
import numpy as np


def check_grads(f, args, order=1, modes=("rev",), atol=1e-5, rtol=1e-5,
                eps=1e-6):
    """Compare reverse-mode gradients of scalar-valued ``f`` against central
    finite differences, leaf by leaf, for every pytree arg."""
    del order, modes
    grads = jax.grad(f, argnums=tuple(range(len(args))))(*args)
    for ai, g in enumerate(grads):
        leaves_g, treedef = jax.tree.flatten(g)
        leaves_a = treedef.flatten_up_to(args[ai])
        for li, (ga, aa) in enumerate(zip(leaves_g, leaves_a)):
            aa = np.asarray(aa, dtype=np.float64)
            fd = np.zeros_like(aa)
            it = np.nditer(aa, flags=["multi_index"])
            while not it.finished:
                idx = it.multi_index
                def feval(v):
                    pert = aa.copy()
                    pert[idx] = v
                    new_leaves = list(leaves_a)
                    new_leaves[li] = jnp.asarray(pert)
                    new_arg = treedef.unflatten(new_leaves)
                    new_args = list(args)
                    new_args[ai] = new_arg
                    return float(f(*new_args))
                fd[idx] = (feval(aa[idx] + eps) - feval(aa[idx] - eps)) \
                    / (2 * eps)
                it.iternext()
            np.testing.assert_allclose(np.asarray(ga), fd, atol=atol,
                                       rtol=rtol)
