"""Misc utilities.

Capability parity with ``idiaptts/misc/utils.py`` (the parts not already
in :mod:`idiaptts_tpu.ops.interpolation`): ``parse_int_set`` :185,
``log_git_hash`` :245, memory logging :152-176, pretty printers
:259-300, ``makedirs_safe``, ``file_len``, ``get_id_list``.
"""

import logging
import os
import resource
import socket
import subprocess

import numpy as np

logger = logging.getLogger(__name__)

from idiaptts_tpu.models.rnn_dyn import parse_int_set  # noqa: F401


def makedirs_safe(path):
    os.makedirs(path, exist_ok=True)
    return path


def file_len(path):
    with open(path) as f:
        return sum(1 for _ in f)


def get_id_list(file_id_list_path):
    with open(file_id_list_path) as f:
        return [line.strip() for line in f if line.strip()]


def log_git_hash(repo_dir=None):
    """Log hostname + current git hash (utils.log_git_hash :245-256)."""
    try:
        git_hash = subprocess.check_output(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=repo_dir or os.path.dirname(os.path.abspath(__file__)),
            stderr=subprocess.DEVNULL).decode().strip()
    except (subprocess.CalledProcessError, FileNotFoundError):
        git_hash = "unknown"
    logger.info("Running on %s with git hash %s",
                socket.gethostname(), git_hash)
    return git_hash


def get_memory_usage_mb():
    """Current CPU RSS in MB (utils.py memory logging role)."""
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def get_device_memory_stats():
    """Per-device HBM usage where the backend exposes it (replaces
    nvidia-smi polling, utils.get_gpu_memory_map :152-176)."""
    import jax
    stats = {}
    for device in jax.devices():
        try:
            s = device.memory_stats()
            if s:
                stats[str(device)] = {
                    "bytes_in_use": s.get("bytes_in_use"),
                    "bytes_limit": s.get("bytes_limit"),
                }
        except Exception:
            pass
    return stats


def ndarray_to_string(array, precision=4):
    """Pretty printer (utils pretty printers :259-300 role)."""
    return np.array_str(np.asarray(array), precision=precision,
                        suppress_small=True)


def select_skip(iterable, select, skip, start_index=0):
    """Select regions of ``select`` elements every ``select+skip``
    steps (utils.py:225-236 semantics; the reference uses it for id
    list splits)."""
    return [x for i, x in enumerate(iterable)
            if (i - start_index) % (select + skip) < select]


def ncr(n, r):
    """Binomial coefficient (utils.py:178-183 role)."""
    import math
    return math.comb(n, r)


def local_modification_time(file_path):
    """Local-time mtime string (utils.py:238-242 role)."""
    from datetime import datetime, timezone
    utc = datetime.fromtimestamp(os.path.getmtime(file_path),
                                 timezone.utc)
    return utc.astimezone().strftime("%Y-%m-%d %H:%M:%S")


def pretty_print_decimal_places(value):
    """Decimal digits of a float as a string (utils.py:299-300
    semantics, e.g. for lr-derived file suffixes)."""
    return str(np.format_float_positional(value).split(".")[1])


def pretty_print_nested(obj, indent=0):
    pad = "  " * indent
    if isinstance(obj, dict):
        return "\n".join("{}{}:\n{}".format(
            pad, key, pretty_print_nested(value, indent + 1))
            for key, value in obj.items())
    if isinstance(obj, (list, tuple)):
        return "\n".join(pretty_print_nested(v, indent) for v in obj)
    if isinstance(obj, np.ndarray):
        return pad + ndarray_to_string(obj)
    return pad + repr(obj)
