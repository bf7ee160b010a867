"""Host-side streaming pipeline fabric.

Plays the role of the reference's mp.Queue fan-out (``util.py:586–821``)
feeding the device: stages connected by bounded queues with sentinel
shutdown, each stage either a background producer (``source_stage``) or a
pool of worker tasks mapping a function over the upstream queue
(``map_stage``). Threads or processes selectable per stage; per-item
exceptions are logged and swallowed so one bad read cannot stall the
pipeline.

On TPU this host fabric exists to keep a jitted device step saturated:
the final stage typically assembles fixed-shape batches that are fed to
a double-buffered jit function (see remora_tpu.infer).
"""

import multiprocessing as mp
import queue as queue_mod
import traceback
from threading import Thread

from remora_tpu import log

LOGGER = log.get_logger()

DEFAULT_QUEUE_SIZE = 10_000

# Start-method tradeoff: spawn/forkserver re-import __main__, which
# breaks any caller building pipelines at script top level (a pattern the
# reference supports), so the default is fork. Forking a JAX-threaded
# parent draws a CPython warning, but pipeline children never call into
# JAX (pure NumPy/IO) and the worker functions tolerate it in practice —
# set REMORA_TPU_MP_CONTEXT=spawn|forkserver to switch for guarded
# programs (all stage functions/args in this package are picklable).
import os as _os

_MP = mp.get_context(_os.environ.get("REMORA_TPU_MP_CONTEXT", "fork"))

_STOP = StopIteration


class NamedQueue:
    """Thread queue with a name and qsize, mirroring the mp variant's API."""

    def __init__(self, maxsize=0, name="queue"):
        self.maxsize = maxsize
        self.name = name
        self.queue = queue_mod.Queue(maxsize=maxsize)

    def put(self, *args, **kwargs):
        self.queue.put(*args, **kwargs)

    def get(self, *args, **kwargs):
        return self.queue.get(*args, **kwargs)

    def qsize(self):
        return self.queue.qsize()


class NamedMPQueue:
    """mp.Queue with a name and a cross-process size counter."""

    def __init__(self, maxsize=0, name="queue"):
        self.maxsize = maxsize
        self.name = name
        self.queue = _MP.Queue(maxsize=maxsize)
        self._size = _MP.Value("i", 0)

    def put(self, *args, **kwargs):
        self.queue.put(*args, **kwargs)
        with self._size.get_lock():
            self._size.value += 1

    def get(self, *args, **kwargs):
        rval = self.queue.get(*args, **kwargs)
        with self._size.get_lock():
            self._size.value -= 1
        return rval

    def qsize(self):
        return self._size.value


def put_item(item, out_q):
    """Blocking put with periodic timeout so KeyboardInterrupt is handled."""
    while True:
        try:
            return out_q.put(item, timeout=0.1)
        except queue_mod.Full:
            continue


def get_item(in_q):
    while True:
        try:
            return in_q.get(timeout=0.1)
        except queue_mod.Empty:
            continue


def queue_iter(in_q, num_producers=1):
    """Iterate a queue until ``num_producers`` sentinels have been seen."""
    done = 0
    while done < num_producers:
        item = get_item(in_q)
        if item is _STOP:
            done += 1
        else:
            yield item


def _fill_queue(iterator, in_q, num_receivers):
    try:
        for item in iterator:
            put_item(item, in_q)
    except KeyboardInterrupt:
        pass
    except Exception as e:
        LOGGER.debug(
            f"PIPELINE_FILLER_ERROR: '{e}'\n{traceback.format_exc()}"
        )
    for _ in range(num_receivers):
        put_item(_STOP, in_q)


def _worker_loop(func, in_q, out_q, prep_func, name, args, kwargs):
    LOGGER.debug(f"Starting {name} worker")
    try:
        if prep_func is not None:
            args, kwargs = prep_func(*args, **kwargs)
        for item in queue_iter(in_q):
            try:
                put_item(func(item, *args, **kwargs), out_q)
            except KeyboardInterrupt:
                break
            except Exception as e:
                LOGGER.debug(
                    f"PIPELINE_ITEM_ERROR in {name}: '{e}'\n"
                    f"{traceback.format_exc()}"
                )
    except KeyboardInterrupt:
        pass
    except Exception as e:
        LOGGER.debug(f"PIPELINE_WORKER_ERROR in {name}: '{e}'")
    LOGGER.debug(f"Completed {name} worker")
    put_item(_STOP, out_q)


def _producer_loop(func, args, kwargs, out_q, name):
    LOGGER.debug(f"Starting {name} producer")
    try:
        for item in func(*args, **kwargs):
            put_item(item, out_q)
    except KeyboardInterrupt:
        pass
    except Exception as e:
        LOGGER.debug(
            f"PIPELINE_PRODUCER_ERROR in {name}: '{e}'\n"
            f"{traceback.format_exc()}"
        )
    LOGGER.debug(f"Completed {name} producer")
    put_item(_STOP, out_q)


class source_stage:
    """Run a generator function in a background thread/process.

    Iterate this object to consume its output queue.
    """

    def __init__(self, func, args=(), kwargs=None, q_maxsize=DEFAULT_QUEUE_SIZE,
                 use_process=False, use_mp_queue=True, name="source"):
        self.name = name
        q_cls = NamedMPQueue if use_mp_queue else NamedQueue
        self.out_q = q_cls(maxsize=q_maxsize, name=f"{name}.out")
        worker_cls = _MP.Process if use_process else Thread
        worker_cls(
            target=_producer_loop,
            args=(func, args, kwargs or {}, self.out_q, name),
            name=f"{name}_producer",
            daemon=True,
        ).start()

    def __iter__(self):
        try:
            yield from queue_iter(self.out_q)
        except KeyboardInterrupt:
            LOGGER.debug(f"source_stage {self.name} interrupted")


class map_stage:
    """Map ``func`` over an upstream iterable with N worker tasks.

    ``prep_func(*args, **kwargs) -> (args, kwargs)`` runs once inside each
    worker for state that must be constructed post-fork (e.g. BAM handles).
    """

    def __init__(self, func, iterator, prep_func=None, num_workers=1,
                 q_maxsize=DEFAULT_QUEUE_SIZE, use_process=False,
                 use_mp_queue=True, args=(), kwargs=None, name="map"):
        self.name = name
        self.num_workers = num_workers
        q_cls = NamedMPQueue if use_mp_queue else NamedQueue
        self.out_q = q_cls(maxsize=q_maxsize, name=f"{name}.out")
        in_q = q_cls(maxsize=q_maxsize, name=f"{name}.in")
        worker_cls = _MP.Process if use_process else Thread
        # the filler is always a thread: it drains an in-process iterator
        # (often a generator or upstream stage) that cannot be pickled
        # into a spawned process
        Thread(
            target=_fill_queue,
            args=(iterator, in_q, num_workers),
            name=f"{name}_filler",
            daemon=True,
        ).start()
        for idx in range(num_workers):
            worker_cls(
                target=_worker_loop,
                args=(func, in_q, self.out_q, prep_func, name, list(args),
                      kwargs or {}),
                name=f"{name}_{idx}",
                daemon=True,
            ).start()

    def __iter__(self):
        try:
            yield from queue_iter(self.out_q, self.num_workers)
        except KeyboardInterrupt:
            LOGGER.debug(f"map_stage {self.name} interrupted")
