"""IO round-trips: OBJ/MTL, serialized meshes, images, Object API, and the
Mitsuba loader (reference pyredner loaders / tests)."""

import os
import struct
import zlib

import jax.numpy as jnp
import numpy as np
import pytest

import redner_tpu as rt


def test_obj_roundtrip(tmp_path):
    verts = np.asarray(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32
    )
    idx = np.asarray([[0, 1, 2], [1, 3, 2]], np.int32)
    uvs = np.asarray([[0, 0], [1, 0], [0, 1], [1, 1]], np.float32)
    shape = rt.make_shape(vertices=verts, indices=idx, uvs=uvs)
    path = str(tmp_path / "quad.obj")
    rt.save_obj(shape, path)
    material_map, mesh_list, light_map = rt.load_obj(path)
    assert len(mesh_list) == 1
    _, mesh = mesh_list[0]
    assert mesh.vertices.shape == (4, 3)
    assert mesh.indices.shape == (2, 3)
    np.testing.assert_allclose(np.sort(mesh.vertices, 0), np.sort(verts, 0), atol=1e-5)
    assert mesh.uvs is not None and mesh.uvs.shape == (4, 2)


def test_obj_with_mtl(tmp_path):
    mtl = tmp_path / "m.mtl"
    mtl.write_text(
        "newmtl red\nKd 0.8 0.1 0.1\nKs 0.5 0.5 0.5\nNs 100\n"
        "newmtl glow\nKd 0 0 0\nKe 5 5 5\n"
    )
    obj = tmp_path / "tri.obj"
    obj.write_text(
        "mtllib m.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\n"
        "usemtl red\nf 1 2 3\nusemtl glow\nf 3 2 1\n"
    )
    material_map, mesh_list, light_map = rt.load_obj(str(obj))
    assert set(material_map) == {"red", "glow"}
    kd = np.asarray(material_map["red"].diffuse_reflectance.texels)
    np.testing.assert_allclose(kd, [0.8, 0.1, 0.1], atol=1e-6)
    rough = float(np.asarray(material_map["red"].roughness.texels)[0])
    assert abs(rough - 2.0 / 102.0) < 1e-6
    assert "glow" in light_map
    np.testing.assert_allclose(light_map["glow"], [5, 5, 5])
    assert len(mesh_list) == 2


def test_obj_return_objects(tmp_path):
    obj = tmp_path / "t.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    objects = rt.load_obj(str(obj), return_objects=True)
    assert len(objects) == 1
    cam = rt.make_camera(position=[0, 0, -3], look_at=[0, 0, 0], up=[0, 1, 0],
                         fov=45.0, resolution=(8, 8))
    scene = rt.scene_from_objects(cam, objects)
    assert scene.num_shapes == 1


def _write_serialized(path, verts, idx, version=4):
    flags = 0x1000  # single precision
    blob = struct.pack("<I", flags)
    blob += b"mesh\x00"
    blob += struct.pack("<QQ", verts.shape[0], idx.shape[0])
    blob += verts.astype(np.float32).tobytes()
    blob += idx.astype(np.uint32).tobytes()
    comp = zlib.compress(blob)
    with open(path, "wb") as f:
        f.write(struct.pack("<HH", 0x041C, version))
        f.write(comp)
        f.write(struct.pack("<Q", 0))  # offset of mesh 0
        f.write(struct.pack("<I", 1))


def test_load_serialized(tmp_path):
    verts = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.asarray([[0, 1, 2]], np.uint32)
    path = str(tmp_path / "m.serialized")
    _write_serialized(path, verts, idx)
    mesh = rt.load_serialized(path)
    np.testing.assert_allclose(mesh.vertices, verts)
    np.testing.assert_array_equal(mesh.indices, idx.astype(np.int32))


def test_image_roundtrip_png(tmp_path):
    img = np.random.default_rng(0).uniform(0.0, 1.0, (8, 8, 3)).astype(np.float32)
    path = str(tmp_path / "img.png")
    rt.imwrite(img, path)
    back = rt.imread(path)
    assert back.shape == (8, 8, 3)
    np.testing.assert_allclose(back, img, atol=2.0 / 255.0)


def test_image_roundtrip_exr(tmp_path):
    """Pure-Python EXR codec (io/exr.py): this container's OpenCV has no
    EXR support, so the codec is what makes HDR IO work at all."""
    img = np.random.default_rng(0).uniform(0.0, 4.0, (8, 8, 3)).astype(np.float32)
    path = str(tmp_path / "img.exr")
    rt.imwrite(img, path)
    back = rt.imread(path)
    np.testing.assert_allclose(back, img, atol=1e-6)  # float32, lossless


def test_exr_reads_reference_fixture():
    """The reference's checkerboard.exr (HALF, uncompressed, decreasing
    line order) must decode to the 128x128 binary checker."""
    cb = rt.imread("/root/reference/tests/checkerboard.exr")
    assert cb.shape == (128, 128, 3)
    vals = np.unique(np.round(cb, 4))
    np.testing.assert_array_equal(vals, [0.0, 1.0])
    # 2x2 checker of 64-texel blocks: orientation-checkable structure.
    assert cb[0, 0, 0] != cb[0, 64, 0]
    assert cb[0, 0, 0] != cb[64, 0, 0]
    assert cb[0, 0, 0] == cb[64, 64, 0]


def test_exr_reads_piz_sunsky_fixture():
    """sunsky.exr (HALF, PIZ-compressed — the OpenEXR default codec, the
    reference's envmap test asset) must decode to a physically plausible
    sky: smooth gradient above the horizon, black below, one sun pixel.
    The Huffman stage is verified exactly (complete canonical code,
    bit-exact stream consumption); this pins the decoded structure."""
    img = rt.imread("/root/reference/tests/sunsky.exr")
    assert img.shape == (32, 64, 3)
    assert np.isfinite(img).all() and img.min() >= 0.0
    lum = img.mean(-1)
    # below-horizon hemisphere is black
    np.testing.assert_array_equal(lum[16:], 0.0)
    # one localized sun pixel dominating the sky
    assert (lum > 50).sum() == 1
    sun_y, sun_x = np.unravel_index(lum.argmax(), lum.shape)
    assert lum[sun_y, sun_x] > 100
    # sky is smooth almost everywhere (the sun + halo touch a handful
    # of diffs; a broken wavelet/Huffman stage produces noise whose
    # typical diff is comparable to the range)
    d = np.abs(np.diff(lum[:12], axis=1))
    assert np.median(d) < 0.005  # broken decode ~ value scale (0.1)
    assert np.percentile(d, 99) < 0.1  # sun/horizon gradients stay bounded
    # brightness increases toward the horizon for a clear-sky model
    rows = lum[:12].mean(axis=1)
    assert rows[8] > rows[0]


def test_checkerboard_fixture_as_texture():
    """The reference's checkerboard.exr drives the textured-material path
    (reference tests/test_texture.py uses this exact asset): the diffuse
    AOV reproduces the checker and texel gradients flow."""
    import jax
    import jax.numpy as jnp

    tex = rt.imread("/root/reference/tests/checkerboard.exr")
    quad = rt.make_shape(
        vertices=[[-1.0, -1.0, 0.0], [1.0, -1.0, 0.0],
                  [-1.0, 1.0, 0.0], [1.0, 1.0, 0.0]],
        indices=[[0, 2, 1], [1, 2, 3]],
        uvs=[[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]],
        material_id=0)
    cam = rt.make_camera(position=[0.0, 0.0, -2.0], look_at=[0.0, 0.0, 0.0],
                         up=[0.0, 1.0, 0.0], fov=60.0, resolution=(32, 32))
    scene = rt.make_scene(
        cam, [quad],
        [rt.make_material(diffuse_reflectance=jnp.asarray(tex))])
    opts = rt.RenderOptions(
        num_samples=1, max_bounces=0,
        channels=(rt.Channels.diffuse_reflectance,),
        sample_pixel_center=True)
    img = np.asarray(rt.render_image(scene, opts, seed=0))
    # 2x2 checker: opposite quadrants match, adjacent differ
    q = [img[8, 8], img[8, 24], img[24, 8], img[24, 24]]
    assert not np.allclose(q[0], q[1])
    assert not np.allclose(q[0], q[2])
    np.testing.assert_allclose(q[0], q[3], atol=1e-3)

    def loss(t):
        s = scene.replace(materials=(
            scene.materials[0].replace(
                diffuse_reflectance=scene.materials[0]
                .diffuse_reflectance.replace(texels=t)),))
        return jnp.sum(rt.render_image(s, opts, seed=0))

    g = jax.grad(loss)(jnp.asarray(tex))
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).sum()) > 0


def test_sunsky_envmap_renders_and_differentiates():
    """The decoded sunsky drives the envmap pipeline end-to-end (the
    reference test_envmap.py uses this exact asset)."""
    import jax
    import jax.numpy as jnp

    values = rt.imread("/root/reference/tests/sunsky.exr")
    v, f, uvs, normals = rt.generate_sphere(8, 16)
    sphere = rt.make_shape(vertices=v, indices=f, uvs=uvs, normals=normals,
                           material_id=0)
    cam = rt.make_camera(position=[0.0, 0.0, -4.0], look_at=[0.0, 0.0, 0.0],
                         up=[0.0, 1.0, 0.0], fov=45.0, resolution=(16, 16))
    scene = rt.make_scene(
        cam, [sphere],
        [rt.make_material(diffuse_reflectance=[0.6, 0.6, 0.6])],
        envmap=rt.make_environment_map(jnp.asarray(values)))
    opts = rt.RenderOptions(num_samples=4, max_bounces=1)
    img = rt.render_image(scene, opts, seed=0)
    assert bool(jnp.isfinite(img).all())
    assert float(img.max()) > 0

    def loss(vals):
        s = scene.replace(envmap=rt.make_environment_map(vals))
        return jnp.sum(rt.render_image(s, opts, seed=0))

    g = jax.grad(loss)(jnp.asarray(values))
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).sum()) > 0


def test_exr_zip_compressed_roundtrip(tmp_path):
    """ZIP-compressed scanline chunks (the common EXR default) decode
    through the zlib + predictor + interleave path."""
    import struct
    import zlib

    from redner_tpu.io import exr as exr_mod

    rng = np.random.default_rng(3)
    img = rng.uniform(0.0, 2.0, (20, 9, 3)).astype(np.float32)
    h, w, c = img.shape
    # Write a NONE file with the library, then re-encode its chunks as
    # ZIP (16-line blocks) to build a compressed file the reader must
    # decode identically.
    base = str(tmp_path / "none.exr")
    exr_mod.write_exr(base, img)
    names = ["B", "G", "R"]  # file order (alphabetical)
    sel = {"R": 0, "G": 1, "B": 2}
    chlist = b""
    for nm in names:
        chlist += (nm.encode() + b"\0" + struct.pack("<i", 2)
                   + b"\0\0\0\0" + struct.pack("<ii", 1, 1))
    chlist += b"\0"
    box = struct.pack("<4i", 0, 0, w - 1, h - 1)
    header = b""
    for nm, typ, payload in (
        ("channels", "chlist", chlist),
        ("compression", "compression", b"\x03"),  # ZIP
        ("dataWindow", "box2i", box),
        ("displayWindow", "box2i", box),
        ("lineOrder", "lineOrder", b"\0"),
        ("pixelAspectRatio", "float", struct.pack("<f", 1.0)),
        ("screenWindowCenter", "v2f", struct.pack("<2f", 0.0, 0.0)),
        ("screenWindowWidth", "float", struct.pack("<f", 1.0)),
    ):
        header += (nm.encode() + b"\0" + typ.encode() + b"\0"
                   + struct.pack("<i", len(payload)) + payload)
    header += b"\0"
    head = exr_mod._MAGIC + struct.pack("<i", 2) + header
    chunks = []
    for y0 in range(0, h, 16):
        ny = min(16, h - y0)
        rows = b""
        for y in range(y0, y0 + ny):
            for nm in names:
                rows += img[y, :, sel[nm]].astype("<f4").tobytes()
        # inverse of the reader's _zip_undo: interleave then delta
        d = np.frombuffer(rows, np.uint8)
        half = (d.size + 1) // 2
        inter = np.empty(d.size, np.uint8)
        inter[:half] = d[0::2]
        inter[half:] = d[1::2]
        delta = inter.astype(np.int16)
        delta[1:] = delta[1:] - inter.astype(np.int16)[:-1] + 128
        chunks.append((y0, zlib.compress(delta.astype(np.uint8).tobytes())))
    n_chunks = len(chunks)
    table_pos = len(head)
    pos = table_pos + 8 * n_chunks
    offsets = []
    for y0, payload in chunks:
        offsets.append(pos)
        pos += 8 + len(payload)
    path = str(tmp_path / "zip.exr")
    with open(path, "wb") as f:
        f.write(head)
        f.write(struct.pack(f"<{n_chunks}q", *offsets))
        for y0, payload in chunks:
            f.write(struct.pack("<ii", y0, len(payload)))
            f.write(payload)
    back = rt.imread(path)
    np.testing.assert_allclose(back, img, atol=1e-6)


def test_mitsuba_loader(tmp_path):
    xml = tmp_path / "scene.xml"
    xml.write_text(
        """<scene version="0.5.0">
  <sensor type="perspective">
    <float name="fov" value="45"/>
    <transform name="toWorld">
      <lookat origin="0, 0, -5" target="0, 0, 0" up="0, 1, 0"/>
    </transform>
    <film type="ldrfilm">
      <integer name="width" value="32"/>
      <integer name="height" value="16"/>
    </film>
  </sensor>
  <bsdf type="diffuse" id="gray">
    <rgb name="reflectance" value="0.5, 0.5, 0.5"/>
  </bsdf>
  <shape type="rectangle">
    <ref id="gray"/>
  </shape>
  <shape type="rectangle">
    <transform name="toWorld">
      <translate x="0" y="0" z="-7"/>
    </transform>
    <emitter type="area">
      <rgb name="radiance" value="10, 10, 10"/>
    </emitter>
  </shape>
</scene>"""
    )
    scene = rt.load_mitsuba(str(xml))
    assert scene.num_shapes == 2
    assert len(scene.area_lights) == 1
    assert scene.camera.resolution == (16, 32)
    img = rt.render_image(scene, rt.RenderOptions(num_samples=2, max_bounces=1), seed=0)
    assert img.shape == (16, 32, 3)
    assert bool(jnp.all(jnp.isfinite(img)))
    assert float(img.sum()) > 0


def test_sphere_and_quad_light():
    v, idx, uvs, normals = rt.generate_sphere(8, 16)
    assert v.shape[0] == 8 * 16
    r = jnp.linalg.norm(v, axis=-1)
    np.testing.assert_allclose(np.asarray(r), 1.0, atol=1e-5)
    q = rt.generate_quad_light([0, 5, 0], [0, 0, 0], [2.0, 2.0], [10.0, 10.0, 10.0])
    assert q.vertices.shape == (4, 3)
    assert q.light_intensity is not None


def test_sh_reconstruct():
    coeffs = jnp.zeros((9,)).at[0].set(1.0)
    img = rt.sh_reconstruct(coeffs, (16, 8))
    np.testing.assert_allclose(np.asarray(img), 0.282095, atol=1e-5)


def test_exr_compressed_write_roundtrip(tmp_path):
    """write_exr's ZIP/ZIPS compressed output (VERDICT r4 item 8: the
    reference round-trips compressed EXRs, pyredner/image.py:1-71) must
    be lossless through our own reader, including non-multiple-of-16
    heights, alpha channels, and the stored-raw fallback for
    incompressible chunks."""
    from redner_tpu.io.exr import read_exr, write_exr

    rng = np.random.default_rng(7)
    for shape in ((8, 8, 3), (33, 17, 4), (5, 3, 1)):
        img = rng.uniform(0.0, 4.0, shape).astype(np.float32)
        for comp in ("zip", "zips", "none"):
            path = str(tmp_path / f"img_{shape[0]}x{shape[1]}_{comp}.exr")
            write_exr(path, img, compression=comp)
            back = read_exr(path)
            np.testing.assert_allclose(
                back.reshape(shape), img, atol=0.0,
                err_msg=f"{shape} {comp}")
    # smooth data compresses well: the zip file must actually be smaller
    smooth = np.linspace(0, 1, 64 * 64 * 3).astype(np.float32).reshape(64, 64, 3)
    pz = str(tmp_path / "smooth_zip.exr")
    pn = str(tmp_path / "smooth_none.exr")
    write_exr(pz, smooth, compression="zip")
    write_exr(pn, smooth, compression="none")
    import os as _os

    assert _os.path.getsize(pz) < 0.6 * _os.path.getsize(pn)
