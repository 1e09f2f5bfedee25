"""Native runtime bindings (ctypes over csrc/runtime.cc).

Builds libcarto_runtime.so on first use (g++ is in the image; no pybind11,
so the C API + ctypes). Falls back cleanly when a compiler is unavailable:
`available()` gates use, and the Python implementations in sensor/ and
core/ remain the reference behavior.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "csrc", "runtime.cc")
_LIB_PATH = os.path.join(_DIR, "libcarto_runtime.so")
_lib = None
_build_lock = threading.Lock()


def _build() -> Optional[str]:
    if os.path.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC):
        return _LIB_PATH
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
             _SRC, "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120)
        return _LIB_PATH
    except (subprocess.SubprocessError, FileNotFoundError):
        return None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    with _build_lock:
        if _lib is not None:
            return _lib
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        # BlockingQueue
        lib.bq_create.restype = ctypes.c_void_p
        lib.bq_create.argtypes = [ctypes.c_size_t]
        lib.bq_destroy.argtypes = [ctypes.c_void_p]
        lib.bq_push.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.bq_pop.restype = ctypes.c_int
        lib.bq_pop.argtypes = [ctypes.c_void_p,
                               ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
        lib.bq_size.restype = ctypes.c_size_t
        lib.bq_size.argtypes = [ctypes.c_void_p]
        # ThreadPool
        lib.tp_create.restype = ctypes.c_void_p
        lib.tp_create.argtypes = [ctypes.c_int]
        lib.tp_destroy.argtypes = [ctypes.c_void_p]
        lib.tp_create_task.restype = ctypes.c_int64
        lib.tp_create_task.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        lib.tp_add_dependency.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64]
        lib.tp_schedule.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.tp_wait_idle.argtypes = [ctypes.c_void_p]
        # OrderedMultiQueue
        lib.omq_create.restype = ctypes.c_void_p
        lib.omq_destroy.argtypes = [ctypes.c_void_p]
        lib.omq_add_queue.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.omq_finish_queue.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.omq_add.restype = ctypes.c_int
        lib.omq_add.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
        lib.omq_next.restype = ctypes.c_int
        lib.omq_next.argtypes = [ctypes.c_void_p] + [ctypes.POINTER(ctypes.c_int64)] * 3
        lib.omq_blocker.restype = ctypes.c_int64
        lib.omq_blocker.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


_TASK_FN = ctypes.CFUNCTYPE(None, ctypes.c_void_p)


class NativeBlockingQueue:
    """Bounded MPMC queue of Python objects backed by the C++ queue
    (handles index a Python-side store)."""

    def __init__(self, capacity: int = 0):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._q = lib.bq_create(capacity)
        self._store = {}
        self._next = 0
        self._store_lock = threading.Lock()

    def push(self, item) -> None:
        with self._store_lock:
            handle = self._next
            self._next += 1
            self._store[handle] = item
        self._lib.bq_push(self._q, handle)

    def pop(self, timeout_ms: int = -1):
        out = ctypes.c_int64()
        ok = self._lib.bq_pop(self._q, ctypes.byref(out), timeout_ms)
        if not ok:
            raise TimeoutError("bq_pop timed out")
        with self._store_lock:
            return self._store.pop(out.value)

    def __len__(self) -> int:
        return self._lib.bq_size(self._q)

    def __del__(self):
        try:
            self._lib.bq_destroy(self._q)
        except Exception:
            pass


class NativeThreadPool:
    """Task-DAG thread pool (common/thread_pool.h semantics)."""

    def __init__(self, num_threads: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._pool = lib.tp_create(num_threads)
        self._callbacks = {}  # keep ctypes callbacks alive

    def create_task(self, fn) -> int:
        cb = _TASK_FN(lambda _arg: fn())
        task_id = self._lib.tp_create_task(
            self._pool, ctypes.cast(cb, ctypes.c_void_p), None)
        self._callbacks[task_id] = cb
        return task_id

    def add_dependency(self, task_id: int, dependency_id: int) -> None:
        self._lib.tp_add_dependency(self._pool, task_id, dependency_id)

    def schedule(self, task_id: int) -> None:
        self._lib.tp_schedule(self._pool, task_id)

    def wait_idle(self) -> None:
        self._lib.tp_wait_idle(self._pool)

    def shutdown(self) -> None:
        if self._pool is not None:
            self._lib.tp_destroy(self._pool)
            self._pool = None


class NativeOrderedMultiQueue:
    """Drop-in engine for sensor.collator.OrderedMultiQueue: ordering logic
    in C++, payloads on the Python side."""

    def __init__(self):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._q = lib.omq_create()
        self._store = {}
        self._next_handle = 0
        self._key_to_id = {}
        self._id_to_key = {}
        self._callbacks = {}
        self.blocker = None

    def _key_id(self, key) -> int:
        if key not in self._key_to_id:
            kid = len(self._key_to_id)
            self._key_to_id[key] = kid
            self._id_to_key[kid] = key
        return self._key_to_id[key]

    def add_queue(self, key, callback) -> None:
        if key in self._key_to_id and key in self._callbacks:
            raise KeyError(f"queue {key} already exists")
        kid = self._key_id(key)
        self._callbacks[key] = callback
        self._lib.omq_add_queue(self._q, kid)

    def mark_queue_as_finished(self, key) -> None:
        self._lib.omq_finish_queue(self._q, self._key_id(key))
        self._dispatch()

    def add(self, key, time: int, data) -> None:
        if key not in self._key_to_id:
            return  # unknown queue: drop (reference behavior)
        handle = self._next_handle
        self._next_handle += 1
        self._store[handle] = data
        if not self._lib.omq_add(self._q, self._key_to_id[key], time, handle):
            del self._store[handle]
            return
        self._dispatch()

    def flush(self) -> None:
        for key in list(self._callbacks):
            self._lib.omq_finish_queue(self._q, self._key_id(key))
        self._dispatch()

    def _dispatch(self) -> None:
        key_out = ctypes.c_int64()
        time_out = ctypes.c_int64()
        handle_out = ctypes.c_int64()
        while True:
            rc = self._lib.omq_next(self._q, ctypes.byref(key_out),
                                    ctypes.byref(time_out),
                                    ctypes.byref(handle_out))
            if rc == -1:
                # Reference CHECK (ordered_multi_queue.cc Dispatch).
                raise ValueError(
                    f"out-of-order dispatch from queue "
                    f"{self._id_to_key.get(key_out.value)}: {time_out.value}")
            if rc == 0:
                break
            key = self._id_to_key[key_out.value]
            data = self._store.pop(handle_out.value)
            self._callbacks[key](time_out.value, data)
        blocker_id = self._lib.omq_blocker(self._q)
        self.blocker = self._id_to_key.get(blocker_id)

    def __del__(self):
        try:
            self._lib.omq_destroy(self._q)
        except Exception:
            pass
