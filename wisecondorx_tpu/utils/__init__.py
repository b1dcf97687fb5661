from wisecondorx_tpu.utils.log import setup_logging, stage_timer

__all__ = ["setup_logging", "stage_timer"]
