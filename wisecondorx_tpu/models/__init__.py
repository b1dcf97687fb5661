from wisecondorx_tpu.models.reference import NewrefConfig, build_reference

__all__ = ["NewrefConfig", "build_reference"]
