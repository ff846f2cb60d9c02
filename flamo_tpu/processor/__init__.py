from flamo_tpu.processor import dsp, system
