from soundscope_tpu.ops.biquad import BlockFilter, block_iir  # noqa: F401
from soundscope_tpu.ops.kweight import design_kweight, kweight_cascade_ss  # noqa: F401
from soundscope_tpu.ops.midside import mid_side_split, deinterleave  # noqa: F401
from soundscope_tpu.ops.decimate import minmax_decimate  # noqa: F401
from soundscope_tpu.ops.truepeak import true_peak_kernel, sample_peak  # noqa: F401
from soundscope_tpu.ops.spectrum import spectrum_points, hann_window  # noqa: F401
