"""PyTorch interop: drive the TPU renderer from torch training loops.

The reference maintains a full second-framework mirror
(pyredner_tensorflow/, with a custom DataPtr op to pass tensor addresses,
pyredner_tensorflow/custom_ops/data_ptr.cc:27-60).  The TPU-native
equivalent is thinner and safer: a torch.autograd.Function whose forward
calls the JAX renderer and whose backward returns the JAX-computed scene
cotangents, tensors crossing via numpy (host sync) — torch here is a
front-end, the compute path stays XLA.

Usage:
    render = TorchRenderer(options)
    img = render(vertices_torch, diffuse_torch, scene_template)
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np


class TorchRenderer:
    """Differentiable bridge: torch tensors in/out, JAX render inside.

    `param_setter(scene_template, *params) -> scene` places the torch-side
    parameters (converted to jnp) into the scene pytree.
    """

    def __init__(self, options, param_setter: Callable, seed: int = 0):
        import torch  # local import: torch is optional

        self.options = options
        self.param_setter = param_setter
        self.seed = seed

        import jax
        import jax.numpy as jnp

        from redner_tpu.render_grad import make_render

        render_fn = make_render(options)

        outer = self

        class _Fn(torch.autograd.Function):
            @staticmethod
            def forward(ctx, scene_template, seed, *params):
                jparams = tuple(jnp.asarray(p.detach().cpu().numpy())
                                for p in params)
                # Keep only the small replay inputs on ctx — NOT the vjp
                # closure, whose residual tree would pin device memory
                # until backward runs (a training loop calling forward
                # twice before backward would leak).  Backward re-renders,
                # exactly like the reference (render_pytorch.py:1050).
                ctx._template = scene_template
                ctx._seed = seed
                ctx._jparams = jparams
                ctx._devices = [p.device for p in params]
                img = render_fn(
                    outer.param_setter(scene_template, *jparams),
                    jnp.uint32(seed),
                )
                out = torch.from_numpy(np.asarray(img))
                return out.to(params[0].device) if params else out

            @staticmethod
            def backward(ctx, grad_img):
                g = jnp.asarray(grad_img.detach().cpu().numpy())

                def f(*ps):
                    s = outer.param_setter(ctx._template, *ps)
                    return render_fn(s, jnp.uint32(ctx._seed))

                _, vjp_fn = jax.vjp(f, *ctx._jparams)
                grads = vjp_fn(g)
                outs = [None, None]
                for gp, dev in zip(grads, ctx._devices):
                    # torch.autograd requires each gradient on its input's
                    # device (CUDA params would otherwise be rejected).
                    outs.append(
                        torch.from_numpy(np.asarray(gp).copy()).to(dev)
                    )
                return tuple(outs)

        self._fn = _Fn

    def __call__(self, scene_template, *params):
        return self._fn.apply(scene_template, self.seed, *params)
