"""ctypes bridge to the native C++ question matcher.

Builds ``native/question_matcher.cpp`` on first use (g++ -O2 -shared)
and exposes :class:`NativeQuestionSet` with the same ``match`` API as
the Python :class:`idiaptts_tpu.data.questions.QuestionSet`.  Falls
back transparently when the toolchain is unavailable; correctness is
asserted against the Python engine (and hence against the reference's
fixture outputs) in tests.
"""

import ctypes
import logging
import os
import subprocess

import numpy as np

logger = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native",
    "question_matcher.cpp")
_LIB = os.path.join(os.path.dirname(_SRC), "libquestion_matcher.so")

_lib = None


def _build():
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o",
         _LIB], check=True)


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.isfile(_LIB) or (os.path.getmtime(_LIB)
                                    < os.path.getmtime(_SRC)):
        _build()
    lib = ctypes.CDLL(_LIB)
    lib.qm_create.restype = ctypes.c_void_p
    lib.qm_destroy.argtypes = [ctypes.c_void_p]
    lib.qm_add_binary.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                  ctypes.c_int]
    lib.qm_add_continuous.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.qm_dict_size.argtypes = [ctypes.c_void_p]
    lib.qm_dict_size.restype = ctypes.c_int
    lib.qm_match.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                             ctypes.POINTER(ctypes.c_float)]
    _lib = lib
    return lib


class NativeQuestionSet:
    """Drop-in accelerator for QuestionSet.match."""

    def __init__(self, question_set):
        """question_set: a parsed
        :class:`idiaptts_tpu.data.questions.QuestionSet` (we reuse its
        parsed raw patterns, not its compiled regexes)."""
        self.lib = get_lib()
        self.handle = ctypes.c_void_p(self.lib.qm_create())
        self._num_binary = len(question_set.binary)
        self._num_continuous = len(question_set.continuous)
        for key, raw_patterns in question_set.raw_binary:
            joined = "\n".join(raw_patterns).encode()
            self.lib.qm_add_binary(self.handle, joined,
                                   1 if "LL-" in key else 0)
        for key, raw_pattern in question_set.raw_continuous:
            self.lib.qm_add_continuous(self.handle,
                                       raw_pattern.encode())
        self.dict_size = self.lib.qm_dict_size(self.handle)
        # Output layout: binary block then continuous block — matches
        # the Python engine's ordering.
        self._buf = np.zeros(self.dict_size, np.float32)

    def match(self, label):
        ptr = self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        self.lib.qm_match(self.handle, label.encode(), ptr)
        return self._buf.copy()

    def match_many(self, labels):
        out = np.zeros((len(labels), self.dict_size), np.float32)
        ptr_type = ctypes.POINTER(ctypes.c_float)
        for i, label in enumerate(labels):
            self.lib.qm_match(self.handle, label.encode(),
                              out[i].ctypes.data_as(ptr_type))
        return out

    def __del__(self):
        try:
            self.lib.qm_destroy(self.handle)
        except Exception:
            pass
