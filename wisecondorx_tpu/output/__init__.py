from wisecondorx_tpu.output.tables import generate_output_tables

__all__ = ["generate_output_tables"]
