"""Wire protocol for the terrain sampler service.

Newline-delimited JSON over a stream socket: one request object per line,
one response object per line, in order.  Arrays travel as base64-encoded
``.npy`` payloads inside the JSON (self-describing dtype + shape, no
pickle, language-agnostic).

The reference repo has no serving surface (SURVEY.md §2: sampling is
offline CLI dumping, pix2pix.py:276-425); this service exposes the same
sampler semantics — generate_gz / generate_atob / interpolation — as an
online API around the jit-compiled two-stage graph.
"""

import base64
import io
import json

import numpy as np

MAX_LINE = 256 * 1024 * 1024  # refuse absurd payloads rather than OOM


def encode_array(arr):
    """numpy array -> base64 .npy string (self-describing, no pickle)."""
    buf = io.BytesIO()
    # note: not ascontiguousarray — that silently promotes 0-d to (1,)
    np.save(buf, np.asarray(arr, order="C"), allow_pickle=False)
    return base64.b64encode(buf.getvalue()).decode("ascii")


def decode_array(s):
    """base64 .npy string -> numpy array."""
    buf = io.BytesIO(base64.b64decode(s.encode("ascii")))
    return np.load(buf, allow_pickle=False)


def send_msg(wfile, obj):
    wfile.write((json.dumps(obj) + "\n").encode("utf-8"))
    wfile.flush()


def recv_msg(rfile):
    """Read one message; returns None on clean EOF."""
    line = rfile.readline(MAX_LINE)
    if not line:
        return None
    if len(line) >= MAX_LINE:
        raise ValueError(f"message exceeds {MAX_LINE} bytes")
    return json.loads(line.decode("utf-8"))
