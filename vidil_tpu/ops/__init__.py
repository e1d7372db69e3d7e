from vidil_tpu.ops.generation import GenerationConfig, beam_search, nucleus_sample
