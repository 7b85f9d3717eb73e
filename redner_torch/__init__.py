"""redner_torch — the PyTorch front-end mirror of redner_tpu.

The reference ships a full second-framework mirror
(pyredner_tensorflow/: every pyredner module duplicated with TF tensors
around the same C++ core).  This package is the TPU-native analog for
torch: the user-facing classes, loaders, and render entry points of
pyredner, holding torch tensors end-to-end, with the JAX/XLA/Pallas
renderer as the compute core.  Gradients cross the boundary through a
torch.autograd.Function whose backward evaluates the JAX VJP of the
edge-sampled render (visibility gradients included) — the torch side
never needs to hand-list parameters: every float tensor in the scene is
a differentiable leaf.

Usage mirrors pyredner:

    import redner_torch as pyredner
    objects = pyredner.load_obj('teapot.obj', return_objects=True)
    camera = pyredner.automatic_camera_placement(objects, (256, 256))
    scene = pyredner.Scene(camera=camera, objects=objects)
    img = pyredner.render_pathtracing(scene, num_samples=16)
    img.sum().backward()   # grads land on every requires_grad tensor
"""

from redner_tpu.camera import CameraType
from redner_tpu.channels import Channels
from redner_tpu.sampler import SamplerType

from redner_torch.device import get_device, set_device, use_gpu
from redner_torch.texture import Texture
from redner_torch.material import Material
from redner_torch.camera import (Camera, automatic_camera_placement,
                                 generate_intrinsic_mat)
from redner_torch.shape import (Shape, compute_uvs, compute_vertex_normal,
                                smooth)
from redner_torch.area_light import AreaLight
from redner_torch.envmap import EnvironmentMap
from redner_torch.object import Object
from redner_torch.scene import Scene
from redner_torch.render_torch import (RenderFunction, serialize_scene,
                                       render)
from redner_torch.render_utils import (AmbientLight, DeferredLight,
                                       DirectionalLight, PointLight,
                                       SpotLight, render_albedo,
                                       render_deferred, render_g_buffer,
                                       render_generic, render_pathtracing)
from redner_torch.utils import (SH, SH_reconstruct, generate_quad_light,
                                generate_sphere, linear_to_srgb,
                                srgb_to_linear)
from redner_torch.geometry_images import generate_geometry_image
from redner_tpu.render_grad import (get_use_correlated_random_number,
                                    set_use_correlated_random_number)
from redner_tpu.timing import (get_print_timing, set_print_timing)
from redner_torch.load_obj import load_obj
from redner_torch.save_obj import save_mtl, save_obj
from redner_torch.load_mitsuba import load_mitsuba
from redner_torch.image import imread, imwrite
from redner_torch.transform import (gen_look_at_matrix, gen_perspective,
                                    gen_rotate_matrix, gen_scale_matrix,
                                    gen_translate_matrix)

__version__ = "0.1.0"


# Enum namespaces, pyredner-style.
class camera_type:  # noqa: N801
    perspective = CameraType.perspective
    orthographic = CameraType.orthographic
    fisheye = CameraType.fisheye
    panorama = CameraType.panorama


class channels:  # noqa: N801
    radiance = Channels.radiance
    alpha = Channels.alpha
    depth = Channels.depth
    position = Channels.position
    geometry_normal = Channels.geometry_normal
    shading_normal = Channels.shading_normal
    uv = Channels.uv
    barycentric_coordinates = Channels.barycentric_coordinates
    diffuse_reflectance = Channels.diffuse_reflectance
    specular_reflectance = Channels.specular_reflectance
    roughness = Channels.roughness
    generic_texture = Channels.generic_texture
    vertex_color = Channels.vertex_color
    shape_id = Channels.shape_id
    triangle_id = Channels.triangle_id
    material_id = Channels.material_id


class sampler_type:  # noqa: N801
    independent = SamplerType.independent
    sobol = SamplerType.sobol
