"""Multi-host batch-sweep helpers (parallel.multihost)."""

from pyfaceanalysis_tpu.parallel import multihost


def test_shard_work_strided_disjoint_complete():
    items = [f"im{i}" for i in range(10)]
    shards = [multihost.shard_work(items, k, 3) for k in range(3)]
    assert shards[0] == ["im0", "im3", "im6", "im9"]
    flat = sorted(sum(shards, []))
    assert flat == sorted(items)                 # complete + disjoint
    assert len(set(map(tuple, shards))) == 3


def test_initialize_single_process_identity():
    pid, nproc = multihost.initialize()
    assert (pid, nproc) == (0, 1)


def test_shard_batch_files_pairs_stay_aligned():
    imgs = [f"i{k}.jpg" for k in range(5)]
    outs = [f"o{k}.txt" for k in range(5)]
    si, so = multihost.shard_batch_files(imgs, outs, 1, 2)
    assert si == ["i1.jpg", "i3.jpg"]
    assert so == ["o1.txt", "o3.txt"]
