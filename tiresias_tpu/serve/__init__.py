"""serve subpackage of tiresias-tpu: streaming recognition frontend."""

from tiresias_tpu.serve.streaming import ChannelState, StreamingRecognizer

__all__ = ["ChannelState", "StreamingRecognizer"]
