from .windows import run_streaming_tumbling_agg, streaming_tumbling_agg

__all__ = ["run_streaming_tumbling_agg", "streaming_tumbling_agg"]
