"""redner_torch: the PyTorch front-end mirror (reference
pyredner_tensorflow/ role — SURVEY §2.2 'TF mirror' row).

Checks that the torch API builds the same scenes, renders the same
images, and returns the same gradients as the native JAX API, with
torch.autograd as the outer framework.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

import redner_tpu as rt
import redner_torch as rtt


def _torch_scene(res=(16, 16), requires_grad=False):
    cam = rtt.Camera(position=[0.0, 0.0, -5.0], look_at=[0.0, 0.0, 0.0],
                     up=[0.0, 1.0, 0.0], fov=[45.0], resolution=res)
    verts = torch.tensor(
        [[-1.7, 1.0, 0.0], [1.0, 1.0, 0.0], [-0.5, -1.0, 0.0]],
        requires_grad=requires_grad)
    diffuse = torch.tensor([0.5, 0.4, 0.3], requires_grad=requires_grad)
    mat = rtt.Material(diffuse_reflectance=diffuse)
    obj = rtt.Object(vertices=verts, indices=[[0, 1, 2]], material=mat)
    light = rtt.generate_quad_light(position=[0.0, 0.0, -7.0],
                                    look_at=[0.0, 0.0, 0.0],
                                    size=[2.0, 2.0],
                                    intensity=[20.0, 20.0, 20.0])
    scene = rtt.Scene(camera=cam, objects=[obj, light])
    return scene, verts, diffuse


def _jax_scene(res=(16, 16)):
    cam = rt.make_camera(position=[0.0, 0.0, -5.0], look_at=[0.0, 0.0, 0.0],
                         up=[0.0, 1.0, 0.0], fov=[45.0], resolution=res)
    tri = rt.make_shape(
        vertices=[[-1.7, 1.0, 0.0], [1.0, 1.0, 0.0], [-0.5, -1.0, 0.0]],
        indices=[[0, 1, 2]])
    mat = rt.make_material(diffuse_reflectance=[0.5, 0.4, 0.3])
    lobj = rt.generate_quad_light(position=[0.0, 0.0, -7.0],
                                  look_at=[0.0, 0.0, 0.0],
                                  size=[2.0, 2.0],
                                  intensity=[20.0, 20.0, 20.0])
    objs = [rt.Object(vertices=tri.vertices, indices=tri.indices,
                      material=mat), lobj]
    return rt.scene_from_objects(cam, objs), tri


def test_forward_matches_native():
    """Same scene, same seed: torch mirror == native JAX render."""
    tscene, _, _ = _torch_scene()
    jscene, _ = _jax_scene()
    opts = rt.RenderOptions(num_samples=2, max_bounces=1)
    timg = rtt.render(tscene, num_samples=2, max_bounces=1, seed=7)
    jimg = rt.render(jscene, opts, seed=7)
    np.testing.assert_allclose(timg.detach().numpy(), np.asarray(jimg),
                               rtol=1e-5, atol=1e-6)


def test_gradients_match_native():
    """torch .backward() grads == jax.grad of the same scene (vertices,
    diffuse reflectance) — including edge-sampled visibility terms."""
    tscene, verts, diffuse = _torch_scene(requires_grad=True)
    jscene, tri = _jax_scene()
    opts = rt.RenderOptions(num_samples=2, max_bounces=1)

    img = rtt.render(tscene, num_samples=2, max_bounces=1, seed=3)
    img.sum().backward()

    def loss(v, d):
        s = jscene.replace(
            shapes=(jscene.shapes[0].replace(vertices=v),) + jscene.shapes[1:],
            materials=(
                jscene.materials[0].replace(
                    diffuse_reflectance=jscene.materials[0]
                    .diffuse_reflectance.replace(texels=d),
                ),
            ) + jscene.materials[1:],
        )
        return jnp.sum(rt.render(s, opts, seed=3))

    gv, gd = jax.grad(loss, argnums=(0, 1))(tri.vertices,
                                            jnp.asarray([0.5, 0.4, 0.3]))
    np.testing.assert_allclose(verts.grad.numpy(), np.asarray(gv),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(diffuse.grad.numpy(), np.asarray(gd),
                               rtol=1e-4, atol=1e-5)


def test_camera_gradients_flow():
    tscene, _, _ = _torch_scene()
    tscene.camera.position.requires_grad_(True)
    img = rtt.render(tscene, num_samples=2, max_bounces=1, seed=1)
    img.sum().backward()
    g = tscene.camera.position.grad
    assert g is not None and bool(torch.isfinite(g).all())
    assert float(g.abs().sum()) > 0


def test_two_forwards_then_backwards():
    """Calling forward twice before backward must not mix gradients
    (ctx holds replay inputs, not a shared vjp closure)."""
    tscene, verts, _ = _torch_scene(requires_grad=True)
    img_a = rtt.render(tscene, num_samples=2, max_bounces=1, seed=1)
    img_b = rtt.render(tscene, num_samples=2, max_bounces=1, seed=1)
    (img_a.sum() + img_b.sum()).backward()
    g_both = verts.grad.clone()
    verts.grad = None
    img = rtt.render(tscene, num_samples=2, max_bounces=1, seed=1)
    img.sum().backward()
    np.testing.assert_allclose(g_both.numpy(), 2 * verts.grad.numpy(),
                               rtol=1e-4, atol=1e-6)


def test_render_deferred_and_albedo():
    tscene, verts, diffuse = _torch_scene(requires_grad=True)
    lights = [rtt.PointLight(position=[0.0, 0.0, -4.0],
                             intensity=[10.0, 10.0, 10.0]),
              rtt.AmbientLight(intensity=[0.1, 0.1, 0.1])]
    img = rtt.render_deferred(tscene, lights, aa_samples=1, seed=0)
    assert img.shape == (16, 16, 3)
    img.sum().backward()
    assert diffuse.grad is not None and bool(
        torch.isfinite(diffuse.grad).all())
    alb = rtt.render_albedo(tscene, num_samples=2, seed=0)
    assert bool(torch.isfinite(alb).all())


def test_g_buffer_channels():
    tscene, _, _ = _torch_scene()
    g = rtt.render_g_buffer(
        tscene, [rtt.channels.depth, rtt.channels.shading_normal],
        num_samples=1, seed=0)
    assert g.shape == (16, 16, 4)
    assert bool(torch.isfinite(g).all())


def test_load_obj_objects_and_render():
    objs = rtt.load_obj("/root/reference/tutorials/teapot.obj",
                        return_objects=True)
    assert all(isinstance(o.vertices, torch.Tensor) for o in objs)
    cam = rtt.automatic_camera_placement(objs, resolution=(8, 8))
    for o in objs:
        o.material = rtt.Material(diffuse_reflectance=[0.5, 0.5, 0.5])
    light = rtt.generate_quad_light(position=[0.0, 120.0, 0.0],
                                    look_at=[0.0, 0.0, 0.0],
                                    size=[80.0, 80.0],
                                    intensity=[30.0, 30.0, 30.0])
    scene = rtt.Scene(camera=cam, objects=objs + [light])
    img = rtt.render_pathtracing(scene, num_samples=1, max_bounces=1, seed=0)
    assert bool(torch.isfinite(img).all())


def test_optimization_recovers_diffuse():
    """Adam on the torch side recovers a diffuse albedo from a target
    render — the end-to-end inverse-rendering loop torch users run."""
    target_scene, _, _ = _torch_scene()
    target = rtt.render(target_scene, num_samples=4, max_bounces=1,
                        seed=5).detach()

    scene, _, _ = _torch_scene()
    guess = torch.tensor([0.1, 0.8, 0.6], requires_grad=True)
    scene.materials[0].diffuse_reflectance.texels = guess
    opt = torch.optim.Adam([guess], lr=0.05)
    for it in range(40):
        opt.zero_grad()
        img = rtt.render(scene, num_samples=4, max_bounces=1, seed=5)
        loss = ((img - target) ** 2).sum()
        loss.backward()
        opt.step()
        with torch.no_grad():
            guess.clamp_(0.0, 1.0)
    final = guess.detach().numpy()
    np.testing.assert_allclose(final, [0.5, 0.4, 0.3], atol=0.05)


def test_mitsuba_roundtrip_scene():
    scene = rtt.load_mitsuba("/root/reference/tests/scenes/cbox/cbox.xml")
    assert isinstance(scene, rtt.Scene)
    assert all(isinstance(s.vertices, torch.Tensor) for s in scene.shapes)
    img = rtt.render_pathtracing(scene, num_samples=1, max_bounces=1, seed=0)
    assert bool(torch.isfinite(img).all())


def test_explicit_constructor_wires_area_lights():
    """pyredner semantics: Scene(camera, shapes, materials, area_lights)
    defines emission purely by AreaLight.shape_id — the mirror must wire
    the native per-shape light ids itself."""
    cam = rtt.Camera(position=[0.0, 0.0, -5.0], look_at=[0.0, 0.0, 0.0],
                     up=[0.0, 1.0, 0.0], fov=[45.0], resolution=(8, 8))
    tri = rtt.Shape(
        vertices=[[-1.7, 1.0, 0.0], [1.0, 1.0, 0.0], [-0.5, -1.0, 0.0]],
        indices=[[0, 1, 2]], material_id=0)
    lshape = rtt.Shape(
        vertices=[[-1.0, -1.0, -7.0], [1.0, -1.0, -7.0],
                  [-1.0, 1.0, -7.0], [1.0, 1.0, -7.0]],
        indices=[[0, 1, 2], [1, 3, 2]], material_id=1)
    mats = [rtt.Material(diffuse_reflectance=[0.5, 0.4, 0.3]),
            rtt.Material(diffuse_reflectance=[0.0, 0.0, 0.0])]
    lights = [rtt.AreaLight(shape_id=1, intensity=[20.0, 20.0, 20.0])]
    scene = rtt.Scene(camera=cam, shapes=[tri, lshape], materials=mats,
                      area_lights=lights)
    img = rtt.render_pathtracing(scene, num_samples=2, max_bounces=1, seed=0)
    assert bool(torch.isfinite(img).all())
    assert float(img.sum()) > 0  # the light actually emits


def test_sh_and_geometry_image_utilities():
    theta = torch.tensor([0.3, 1.2, 2.5])
    phi = torch.tensor([0.1, 2.0, 4.0])
    # Y_0^0 is the constant 1/(2 sqrt(pi))
    y00 = rtt.SH(0, 0, theta, phi)
    np.testing.assert_allclose(y00.numpy(), np.full(3, 0.28209479),
                               rtol=1e-5)
    img = rtt.SH_reconstruct(torch.rand(9, 3), (8, 16))
    assert img.shape == (16, 8, 3) and bool(torch.isfinite(img).all())
    # reference contract: size doubles internally -> (2*size+1)^2 verts
    v, i, uvs = rtt.generate_geometry_image(2)
    assert v.shape == (25, 3) and i.shape == (32, 3) and uvs.shape == (25, 2)
    # Exercise the global toggles, restoring them (correlated replay is a
    # process-wide default other tests rely on).
    old_timing = rtt.get_print_timing()
    old_corr = rtt.get_use_correlated_random_number()
    try:
        rtt.set_print_timing(False)
        rtt.set_use_correlated_random_number(False)
        assert rtt.get_print_timing() is False
        assert rtt.get_use_correlated_random_number() is False
    finally:
        rtt.set_print_timing(old_timing)
        rtt.set_use_correlated_random_number(old_corr)


def test_batch_render_scene_list():
    """Batch rendering: a list of scenes renders to a stacked (B,H,W,C)
    tensor with gradients flowing to every element's leaves (reference
    tests/test_batch.py pattern; render_utils.py list-of-scene support)."""
    s0, v0, _ = _torch_scene(requires_grad=True)
    s1, v1, _ = _torch_scene(requires_grad=True)
    with torch.no_grad():
        v1 += torch.tensor([[0.1, 0.0, 0.0]] * 3)
    imgs = rtt.render_pathtracing([s0, s1], num_samples=2, max_bounces=1,
                                  seed=[3, 4])
    assert imgs.shape == (2, 16, 16, 3)
    # Per-element seeds: element k must equal the single-scene render.
    solo = rtt.render_pathtracing(s1, num_samples=2, max_bounces=1, seed=4)
    np.testing.assert_allclose(imgs[1].detach().numpy(),
                               solo.detach().numpy(), rtol=1e-5, atol=1e-6)
    imgs.sum().backward()
    for v in (v0, v1):
        assert v.grad is not None and bool(torch.isfinite(v.grad).all())
        assert float(v.grad.abs().sum()) > 0.0
    # Deferred + g-buffer batch entries produce stacked outputs too.
    lights = [rtt.AmbientLight(intensity=[0.2, 0.2, 0.2])]
    d = rtt.render_deferred([s0, s1], lights, aa_samples=1, seed=0)
    assert d.shape == (2, 16, 16, 3) and bool(torch.isfinite(d).all())
    with pytest.raises(ValueError):
        rtt.render_pathtracing([s0, s1], num_samples=1, seed=[1, 2, 3])


def test_changing_topology_loop_bounds_bwd_cache():
    """A long torch loop over CHANGING topology (progressive remeshing —
    the reference's geometry-image use case) must not grow the backward
    executable cache without bound: the cache key hashes every index
    array, so each topology is a new entry and the LRU must evict
    (VERDICT r2 weak item 6)."""
    from redner_torch import render_torch as rtorch

    rtorch._bwd_cache.clear()
    saved = rtorch._BWD_CACHE_MAX
    rtorch._BWD_CACHE_MAX = 4
    try:
        base = np.array(
            [[-1.7, 1.0, 0.0], [1.0, 1.0, 0.0], [-0.5, -1.0, 0.0],
             [0.8, -0.9, 0.0]], np.float32)
        for k in range(6):
            cam = rtt.Camera(position=[0.0, 0.0, -5.0],
                             look_at=[0.0, 0.0, 0.0], up=[0.0, 1.0, 0.0],
                             fov=[45.0], resolution=(8, 8))
            verts = torch.tensor(base, requires_grad=True)
            # Alternate topologies: 1 or 2 triangles, varying index content.
            if k % 3 == 0:
                idx = [[0, 1, 2]]
            elif k % 3 == 1:
                idx = [[0, 1, 3]]
            else:
                idx = [[0, 1, 2], [0, 2, 3]]
            mat = rtt.Material(diffuse_reflectance=torch.tensor([0.5, 0.4, 0.3]))
            obj = rtt.Object(vertices=verts, indices=idx, material=mat)
            light = rtt.generate_quad_light(position=[0.0, 0.0, -7.0],
                                            look_at=[0.0, 0.0, 0.0],
                                            size=[2.0, 2.0],
                                            intensity=[20.0, 20.0, 20.0])
            scene = rtt.Scene(camera=cam, objects=[obj, light])
            img = rtt.render(scene, num_samples=1, max_bounces=1, seed=k)
            img.sum().backward()
            assert verts.grad is not None
            assert bool(torch.isfinite(verts.grad).all())
            assert len(rtorch._bwd_cache) <= rtorch._BWD_CACHE_MAX
    finally:
        rtorch._BWD_CACHE_MAX = saved
