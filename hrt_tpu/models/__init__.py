from .camera import Camera, orbit_camera, primary_rays  # noqa: F401
from .mesh import Mesh, cube, icosphere, load_obj, make_mesh, plane  # noqa: F401
from .scene import Scene, SceneData, reference_demo_scene  # noqa: F401
