from vidil_tpu.data.video_reader import VideoReader
from vidil_tpu.data.sampling import sample_frame_indices, load_video_frames
