from wisecondorx_tpu.io.npz import (
    load_sample_npz,
    save_sample_npz,
    load_reference_npz,
    save_reference_npz,
    scale_sample,
    gender_correct,
)

__all__ = [
    "load_sample_npz",
    "save_sample_npz",
    "load_reference_npz",
    "save_reference_npz",
    "scale_sample",
    "gender_correct",
]
