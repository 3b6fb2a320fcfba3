"""Online sampler service for trained two-stage terrain GANs.

`python -m terrain_tpu.serve <experiment> [checkpoint]` starts a TCP
service; TerrainClient is the Python client.  See server.py for the
protocol and the TPU-shaped batching design.
"""

from terrain_tpu.serve.batcher import MicroBatcher, bucket_size
from terrain_tpu.serve.client import TerrainClient
from terrain_tpu.serve.server import TerrainServer

__all__ = ["MicroBatcher", "TerrainClient", "TerrainServer", "bucket_size"]
