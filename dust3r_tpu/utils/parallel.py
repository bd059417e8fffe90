"""Thread/process map helpers for preprocessing pipelines.

Behavioral contract: /root/reference/dust3r/utils/parallel.py:12-79
(star-args support, optional leading workers arg, frozen generator
arguments for process pools).
"""
from __future__ import annotations

from multiprocessing.dummy import Pool as ThreadPool
from multiprocessing import Pool as ProcessPool


def parallel_threads(function, args, workers=0, star_args=False,
                     kw_args=False, front_num=1, Pool=ThreadPool, **tqdm_kw):
    """Run function(*arg) over args with a thread pool + progress bar."""
    if workers <= 0:
        import os
        workers = os.cpu_count() or 4
    try:
        from tqdm import tqdm
    except ImportError:
        def tqdm(x, **kw):
            return x

    args = list(args)
    if star_args and kw_args:
        caller = lambda a: function(*a[0], **a[1])
    elif star_args:
        caller = lambda a: function(*a)
    elif kw_args:
        caller = lambda a: function(**a)
    else:
        caller = function

    # run the first few sequentially (easier debugging, like the reference)
    front = [caller(a) for a in args[:front_num]]

    if len(args) <= front_num:
        return front
    with Pool(workers) as pool:
        rest = list(tqdm(pool.imap(caller, args[front_num:]),
                         total=len(args) - front_num, **tqdm_kw))
    return front + rest


def parallel_processes(function, args, workers=0, **kw):
    """Process-pool variant (for CPU-bound preprocessing)."""
    kw["Pool"] = ProcessPool
    return parallel_threads(function, args, workers=workers, **kw)
