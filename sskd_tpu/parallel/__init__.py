from sskd_tpu.parallel.mesh import create_mesh, mesh_shape_for

__all__ = ["create_mesh", "mesh_shape_for"]
