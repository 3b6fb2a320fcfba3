"""AOT-compiled executable store — O(seconds) cold starts.

The 512px four-network train step costs 5-8 minutes to compile through this
environment's remote-compile relay (CLAUDE.md); the JAX compilation cache
(.jax_cache) keeps *this* machine warm, but a fresh environment pays the
full compile before step 1.  This module persists the compiled executable
itself (jax.experimental.serialize_executable) into a directory that can be
shipped with the model artifacts, so a cold process loads and runs in
seconds — the TPU analog of shipping cuDNN-autotuned plans with a model
(the reference's `dnn.conv.algo_*=time_once` selection lived only in
process memory, experiment.5.sh:5).

Keying: executables are only valid for the exact (jax version, platform,
device kind, program) that produced them, so entries are stored as
<dir>/<tag>-<fingerprint>.aotx where the fingerprint hashes all of those.
A mismatched or unreadable entry falls back to normal jit compilation
(then re-saves).

Usage:
    step = aot_compile(jitted_fn, example_args, tag="train_step_512",
                       cache_dir="aot/")     # load or compile+save
    out = step(*real_args)                    # same arg structure

`jitted_fn` must be a jax.jit-wrapped function; example_args need the
same shapes/dtypes/shardings as the real calls (values are ignored).
"""

import functools
import hashlib
import os
import pickle
import tempfile

import jax

_FORMAT_VERSION = 2


@functools.lru_cache(maxsize=1)
def _source_digest():
    """Hash of every terrain_tpu source file — a cheap (<1 MB) stand-in for
    'the program text', so ANY code edit invalidates stored executables
    without having to re-trace the jaxpr at load time (tracing the 512px
    four-network step costs minutes on this 1-core host and was half the
    measured AOT cold-start, docs/RESULTS_r3.md)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.blake2b(digest_size=8)
    for dirpath, dirnames, filenames in sorted(os.walk(root)):
        dirnames.sort()
        for name in sorted(filenames):
            if name.endswith(".py"):
                p = os.path.join(dirpath, name)
                h.update(p.encode())
                with open(p, "rb") as f:
                    h.update(f.read())
    return h.hexdigest()


# TERRAIN_* knobs that provably do NOT shape the traced program (paths,
# host-side loop counts, run control).  Everything else that starts with
# TERRAIN_ goes into the fingerprint: a forgotten knob then costs at most
# a spurious recompile, never a silently-stale executable.  (TERRAIN_BS /
# TERRAIN_SCAN shape the graph only through arg shapes, which the
# fingerprint already covers.)
_NON_PROGRAM_KNOBS = frozenset({
    "TERRAIN_AOT", "TERRAIN_AOT_KEY", "TERRAIN_MODELS", "TERRAIN_DATA",
    "TERRAIN_OUT", "TERRAIN_N", "TERRAIN_EPOCHS", "TERRAIN_SAVE_EVERY",
    "TERRAIN_RESUME", "TERRAIN_QUICK", "TERRAIN_PROFILE", "TERRAIN_SWD",
    "TERRAIN_PREFETCH", "TERRAIN_EVAL_STEPS", "TERRAIN_SYNTHETIC",
    "TERRAIN_RASTER", "TERRAIN_EPOCH_CROPS", "TERRAIN_ARTIFACT_EVERY",
    "TERRAIN_PLATFORM", "TERRAIN_BS", "TERRAIN_SCAN",
})


def _fingerprint(jitted_fn, example_args, example_kwargs):
    """Hash of everything the serialized executable is conditioned on.

    Default keying ("shapes"): toolchain (jax version, platform, device
    kind/count) + the terrain_tpu source digest + every graph-shaping
    TERRAIN_* env knob (Pallas toggles, compute dtype, op variants — they
    select different programs from identical source and shapes) + the arg
    tree's shapes/dtypes.  Closure-captured array constants (e.g. the
    device-resident dataset) are NOT covered — callers embed a content
    digest in the `tag` (DeviceDataset.digest); scalar config reaching the
    program through closures must likewise be in the tag (the trainer
    embeds its config_digest).

    TERRAIN_AOT_KEY=jaxpr restores the exhaustive program-text key: it
    covers everything but costs a full trace at every load (minutes for
    the 512px step on this host — defeating the point of the store).
    """
    dev = jax.devices()[0]
    parts = [
        f"v{_FORMAT_VERSION}", jax.__version__, dev.platform,
        getattr(dev, "device_kind", "?"), str(jax.device_count()),
    ]
    parts += sorted(
        f"{k}={v}" for k, v in os.environ.items()
        if k.startswith("TERRAIN_") and k not in _NON_PROGRAM_KNOBS)
    if os.environ.get("TERRAIN_AOT_KEY", "shapes") == "jaxpr":
        tr = jax.make_jaxpr(
            lambda *a, **k: jitted_fn(*a, **k))(*example_args,
                                                **example_kwargs)
        parts.append(str(tr))
    else:
        parts.append(_source_digest())
        for leaf in jax.tree.leaves((example_args, example_kwargs)):
            shape = getattr(leaf, "shape", None)
            dtype = getattr(leaf, "dtype", type(leaf).__name__)
            parts.append(f"{shape}/{dtype}")
            sh = getattr(leaf, "sharding", None)
            if sh is not None:
                parts.append(str(sh))
    h = hashlib.sha256("\0".join(parts).encode()).hexdigest()[:16]
    return h


def _path(cache_dir, tag, fp):
    return os.path.join(cache_dir, f"{tag}-{fp}.aotx")


def aot_compile(jitted_fn, example_args, tag, cache_dir,
                example_kwargs=None, verbose=False):
    """Load the compiled executable for `jitted_fn` or compile and save it.

    Returns a callable with jit-call semantics (positional args matching
    example_args).  On any load failure the entry is ignored and rebuilt.

    CONTRACT (default "shapes" keying): `tag` must uniquely identify the
    program among calls sharing a store — the fingerprint only covers the
    toolchain, the terrain_tpu source digest and the arg shapes/dtypes,
    not the program text.  Trainer tags embed mode/in_shp/dataset-digest;
    set TERRAIN_AOT_KEY=jaxpr for exhaustive program-text keying (costs a
    full trace per load).
    """
    from jax.experimental import serialize_executable as se

    example_kwargs = example_kwargs or {}
    os.makedirs(cache_dir, exist_ok=True)
    fp = _fingerprint(jitted_fn, example_args, example_kwargs)
    path = _path(cache_dir, tag, fp)
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                record = pickle.load(f)
            # executables are compiled for a specific device set; loading
            # with the backend default (ALL local devices) breaks on
            # multi-device hosts, so replay the original device ids
            devs = {d.id: d for d in jax.devices()}
            exec_devices = [devs[i] for i in record["device_ids"]]
            compiled = se.deserialize_and_load(
                *record["payload"], execution_devices=exec_devices)
            if verbose:
                print(f"aot: loaded {tag} from {path}")
            return compiled
        except Exception as e:  # corrupt/incompatible entry: recompile
            if verbose:
                print(f"aot: failed to load {path} ({e!r}); recompiling")
    compiled = jitted_fn.lower(*example_args, **example_kwargs).compile()
    try:
        record = {
            "payload": se.serialize(compiled),
            "device_ids": [d.id for d in
                           compiled.runtime_executable().local_devices()],
        }
        # atomic publish: a concurrent reader never sees a partial file
        fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".tmp")
        with os.fdopen(fd, "wb") as f:
            pickle.dump(record, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, path)
        if verbose:
            print(f"aot: saved {tag} -> {path}")
    except Exception as e:
        if verbose:
            print(f"aot: serialize failed for {tag} ({e!r}); "
                  "running from in-process executable")
    return compiled


class AotLazy:
    """jit-like wrapper that AOT-loads/saves on first call, using the real
    first-call arguments as the example args (they define the shapes).

    Calls with a different arg structure/shape than the AOT'd one fall back
    to the wrapped jitted function, so odd-shaped stragglers still work.

    max_entries > 1 persists one executable per distinct arg-shape key (the
    fingerprint already encodes shapes, so entries never collide) — the
    serving path warms up a power-of-2 bucket ladder (serve/server.py
    warmup) and wants each bucket to cold-start from the store; the train
    step keeps the default 1 (its shapes are fixed per run).
    """

    def __init__(self, jitted_fn, tag, cache_dir, verbose=False,
                 max_entries=1):
        self._jitted = jitted_fn
        self._tag = tag
        self._dir = cache_dir
        self._verbose = verbose
        self._max = max_entries
        self._compiled = {}  # shapes-key -> loaded executable

    @staticmethod
    def _shapes_key(args):
        leaves = jax.tree.leaves(args)
        return tuple(
            (getattr(l, "shape", None), str(getattr(l, "dtype", type(l))))
            for l in leaves)

    def __call__(self, *args):
        key = self._shapes_key(args)
        fn = self._compiled.get(key)
        if fn is None:
            if len(self._compiled) >= self._max:
                # over the entry budget: don't multiply AOT entries, just jit
                return self._jitted(*args)
            try:
                fn = aot_compile(self._jitted, args, self._tag, self._dir,
                                 verbose=self._verbose)
            except Exception as e:
                if self._verbose:
                    print(f"aot: {self._tag} unavailable ({e!r}); using jit")
                fn = self._jitted
            self._compiled[key] = fn
        return fn(*args)

    def lower(self, *args, **kw):
        return self._jitted.lower(*args, **kw)
