"""redner_tpu — a TPU-native differentiable Monte Carlo path tracer.

A from-scratch JAX/XLA/Pallas implementation of physically-based rendering
with unbiased scene-parameter gradients via edge sampling (Li et al.,
"Differentiable Monte Carlo Ray Tracing through Edge Sampling", SIGGRAPH
Asia 2018), with the same capabilities as the reference C++/CUDA framework
BachiLi/redner — re-designed TPU-first: SPMD wavefronts over pixel tensors,
functional transforms for gradients, shard_map over device meshes for
multi-chip scaling.
"""

from redner_tpu.camera import (Camera, CameraType, automatic_camera_placement,
                               generate_intrinsic_mat, make_camera)
from redner_tpu.channels import ChannelInfo, Channels
from redner_tpu.core.types import Intersection, Ray, RayDifferential, SurfacePoint
from redner_tpu.envmap import EnvironmentMap, make_environment_map
from redner_tpu.geometry import (Shape, compute_uvs, compute_vertex_normal,
                                 make_shape, smooth)
from redner_tpu.light import AreaLight, make_area_light
from redner_tpu.material import Material, make_material
from redner_tpu.render import RenderOptions, render_image
from redner_tpu.render_grad import (render, set_use_correlated_random_number,
                                    get_use_correlated_random_number)
from redner_tpu.sampler import SamplerType
from redner_tpu.scene import FlatScene, Scene, flatten_scene, make_scene
from redner_tpu.texture import Texture, make_texture
from redner_tpu.object import Object, scene_from_objects
from redner_tpu.io import (imread, imwrite, load_mitsuba, load_obj,
                           load_serialized, save_mtl, save_obj)
from redner_tpu.render_utils import (AmbientLight, DeferredLight,
                                     DirectionalLight, PointLight, SpotLight,
                                     render_albedo, render_deferred,
                                     render_g_buffer, render_generic,
                                     render_pathtracing)
from redner_tpu.utils import (generate_quad_light, generate_sphere,
                              linear_to_srgb, sh_eval, sh_reconstruct,
                              srgb_to_linear)
from redner_tpu.serialize import (load_scene, load_state_dict, save_scene,
                                  state_dict)
from redner_tpu.screen_gradient import (screen_gradient_image,
                                        visualize_screen_gradient)
from redner_tpu.geometry_images import generate_geometry_image
from redner_tpu.meshops import load_obj_fast, weld_mesh
from redner_tpu.timing import (get_print_timing, profile_trace,
                               set_print_timing, timed)
from redner_tpu.device import get_device, set_device, use_gpu

__version__ = "0.1.0"

# camera_type enum namespace, pyredner-style (pyredner/camera_type.py)
class camera_type:  # noqa: N801
    perspective = CameraType.perspective
    orthographic = CameraType.orthographic
    fisheye = CameraType.fisheye
    panorama = CameraType.panorama


# channels namespace, pyredner-style (pyredner/channels.py)
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
