from wisecondorx_tpu.parallel.mesh import bin_mesh, sample_mesh

__all__ = ["bin_mesh", "sample_mesh"]
