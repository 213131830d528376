"""Device-resident training data: upload the corpus once, stream only plans.

Motivation: the training batch is the ONLY recurring host->device transfer
of the train loop (uint8 GT crops, ~2.2 MB/step at the reference geometry).
On hosts with a thin chip link (this sandbox's tunnel degrades to a few
MB/s under load; remote/disaggregated serving links behave the same) that
transfer dominates the step. For corpora that fit HBM — synthetic sets,
fine-tune sets, REDS-scale crops — the TPU-native answer is to keep the
DATASET on the device: upload all frames once, then per step ship only the
sample *plans* (frame indices, crop corners, augmentation index — a few
hundred bytes) and assemble the batch inside a jitted gather on device.

Exactness: `UnpairedClipDataset.sample_plan` draws every random decision
with the same (seed, epoch, i) streams the host loader uses, and the device
gather consumes the identical plan — the produced batches are bit-identical
to the host loader's (tests/test_device_data.py). The spatial augmentation
(flip none/h/w x rot90 k) is applied via 12 precomputed index maps so the
crop + flip + rotation collapse into ONE gather per sample.

Scope: BD (UnpairedClipDataset) and BI (PairedClipDataset — both the GT
and LR stores go resident) training over uniform-geometry corpora, on
single- AND multi-process meshes (each process uploads its replica copy
once and gathers its own dp rows; plans are the only recurring H2D on
every host). Reference counterpart: none — `codes/data/*` always stream
batches from host memory through PCIe every step.
"""

from __future__ import annotations

import numpy as np

from .loader import TrainLoader

__all__ = ["DeviceResidentLoader", "dihedral_maps"]

# keep the resident corpus comfortably below HBM (v5e: 16 GB, minus model,
# optimizer state, activations and the XLA workspace)
MAX_CORPUS_BYTES = 4 << 30


def dihedral_maps(csz: int) -> np.ndarray:
    """(12, csz, csz, 2) source-index maps for the 12 spatial-aug variants
    (flip {none, h, w} x rot90 k in {0..3}), derived by pushing an identity
    index grid through the SAME numpy ops the host path applies — the two
    paths cannot drift."""
    ii, jj = np.meshgrid(np.arange(csz), np.arange(csz), indexing="ij")
    ident = np.stack([ii, jj], axis=-1).astype(np.int32)  # (csz, csz, 2)
    maps = []
    for axis in (1, 2, 3):
        for k in range(4):
            m = ident[None]  # fake t-axis so axis numbers match thwc
            if axis > 1:
                m = np.flip(m, axis - 1)
            m = np.rot90(m, k, (1, 2))
            maps.append(np.ascontiguousarray(m[0]))
    return np.stack(maps)


def _load_uniform_corpus(store, keys):
    """Stack a store's sequences into one (n_clips, T, H, W, C) uint8 array.

    Requires every sequence to share (T, H, W, C); vids are indexed in
    sorted order and the vid->index map is returned for plan translation.
    """
    from .records import make_key, parse_key

    vids = sorted({parse_key(k)[0] for k in keys})
    shapes = set()
    infos = []
    for vid in vids:
        some_key = next(k for k in keys if parse_key(k)[0] == vid)
        _, (tot, h, w), _ = parse_key(some_key)
        infos.append((vid, tot, h, w))
        shapes.add((tot, h, w))
    if len(shapes) != 1:
        raise ValueError(
            f"device-resident data needs a uniform corpus; found clip "
            f"geometries {sorted(shapes)}. Use the host loader "
            f"(device_resident: false) for mixed-geometry data.")
    tot, h, w = next(iter(shapes))
    first = store.get(make_key(*infos[0][:4], 0))
    c = first.shape[-1]
    nbytes = len(vids) * tot * h * w * c
    if nbytes > MAX_CORPUS_BYTES:
        raise ValueError(
            f"corpus is {nbytes / 2 ** 30:.1f} GiB — too large to keep "
            f"device-resident (cap {MAX_CORPUS_BYTES / 2 ** 30:.0f} GiB). "
            f"Use the host loader (device_resident: false).")
    clips = np.empty((len(vids), tot, h, w, c), np.uint8)
    for ci, (vid, tot_, h_, w_) in enumerate(infos):
        for fi in range(tot_):
            clips[ci, fi] = store.get(make_key(vid, tot_, h_, w_, fi))
    return clips, {vid: i for i, (vid, *_rest) in enumerate(infos)}


class DeviceResidentLoader(TrainLoader):
    """TrainLoader drop-in whose epochs yield DEVICE batches.

    Same epoch order, same per-sample RNG streams, same batch contents as
    the host loader — but the per-step host->device payload is the stacked
    plans (int32, ~100 B/sample) instead of the crops; the batch itself is
    born on device. With a multi-device ``mesh`` (single- or
    multi-process) the batch is born already dp-SHARDED (corpus
    replicated, per-device local gather of its own rows) so the training
    step's input sharding is satisfied with zero per-step inter-device
    traffic.
    """

    def __init__(self, dataset, batch_size: int, seed: int = 0, mesh=None,
                 **_unused):
        super().__init__(dataset, batch_size, seed=seed, num_workers=1)
        import jax
        import jax.numpy as jnp

        # paired (BI) datasets carry two stores; unpaired (BD) one
        self._paired = hasattr(dataset, "pairs")
        if self._paired:
            scale = dataset.scale
            gcsz = dataset.gt_crop_size
            lcsz = gcsz // scale
            gt_keys = [gk for gk, _ in dataset.pairs]
            lr_keys = [lk for _, lk in dataset.pairs]
            gt_clips, self.vid_index = _load_uniform_corpus(
                dataset.gt_store, gt_keys)
            lr_clips, _ = _load_uniform_corpus(dataset.lr_store, lr_keys)
            corpora = {"gt": gt_clips, "lr": lr_clips}
            geoms = {"gt": (gcsz, scale), "lr": (lcsz, 1)}
        else:
            clips, self.vid_index = _load_uniform_corpus(
                dataset.store, dataset.keys)
            corpora = {"gt": clips}
            geoms = {"gt": (dataset.crop_size, 1)}

        # Placement: with a multi-device ``mesh`` the corpus + aug maps are
        # REPLICATED over the mesh and the jitted gather emits the batch
        # already sharded over ``dp`` — each device gathers only its own
        # batch rows from its local corpus copy, so the per-step
        # cross-device scatter the reshard path pays does not exist.
        # Without a mesh (or on one device) everything lands on the
        # default device and the model's prepare_training_data device_puts
        # to its dp sharding (a no-op on one chip, an on-fabric scatter on
        # a mesh — never a host->device transfer either way).
        #
        # Multi-PROCESS meshes work the same way: every process loads the
        # corpus from its records store and hands over its addressable
        # replica shards via ``put_global`` (make_array_from_callback — no
        # cross-process traffic), and every process computes the identical
        # global plan batch from the shared (seed, epoch, i) RNG streams,
        # so the jitted SPMD gather gives each host's devices exactly
        # their dp rows. This is the DistributedSampler shard semantics
        # (`/root/reference/codes/data/__init__.py:48-55`) with the shard
        # realised at gather time instead of at the sampler: per-process
        # H2D stays plans-only, which is precisely the deployment shape
        # (one thin-linked host per chip group) the mode exists for.
        if mesh is not None and mesh.devices.size == 1:
            mesh = None
        self._mesh = mesh
        if mesh is not None and batch_size % mesh.devices.size != 0:
            # caught here with a clear message — otherwise GSPMD raises an
            # opaque uneven-sharding error deep inside the jitted assemble
            raise ValueError(
                f"DeviceResidentLoader batch_size={batch_size} is not "
                f"divisible by the {mesh.devices.size}-device mesh; the "
                "dp-sharded batch needs equal per-device rows (the loader "
                "factory always passes batch_size_per_gpu * n_devices)")
        if mesh is not None:
            from ..parallel import batch_sharding, put_global, replicated

            rep = replicated(mesh)
            self._plan_sharding = rep
            put = lambda v: put_global(v, rep)
            out_shardings = batch_sharding(mesh)
        else:
            self._plan_sharding = None
            put = jax.device_put
            out_shardings = None
        self._clips = {k: put(v) for k, v in corpora.items()}
        self._maps = {k: put(dihedral_maps(csz))
                      for k, (csz, _s) in geoms.items()}
        scales = {k: s for k, (_c, s) in geoms.items()}

        def assemble_one(clips_d, maps_d, s, ci, f_idx, tops, lefts, aug):
            frames = jnp.take(clips_d, ci, axis=0)  # (T, H, W, C)
            fr = jnp.take(frames, f_idx, axis=0)    # (t, H, W, C)
            m = jnp.take(maps_d, aug, axis=0)       # (csz, csz, 2)
            rows = s * tops[:, None, None] + m[..., 0]
            cols = s * lefts[:, None, None] + m[..., 1]
            tt = jnp.arange(f_idx.shape[0])[:, None, None]
            return fr[tt, rows, cols]               # (t, csz, csz, C)

        def assemble(clips_d, maps_d, plans):
            return {
                k: jax.vmap(
                    lambda p, k=k: assemble_one(
                        clips_d[k], maps_d[k], scales[k], p["ci"],
                        p["f_idx"], p["tops"], p["lefts"], p["aug"])
                )(plans)
                for k in clips_d
            }

        if out_shardings is None:
            self._assemble = jax.jit(assemble)
        else:
            self._assemble = jax.jit(assemble, out_shardings=out_shardings)

    def epoch(self, epoch_idx: int, start_batch: int = 0):
        """``start_batch`` skips already-consumed batches plan-free on
        resume (same determinism: streams are keyed by (seed, epoch, i))."""
        import jax

        n = len(self.dataset)
        order = np.random.default_rng(
            (self.seed, epoch_idx)).permutation(n)
        for b in range(start_batch, len(self)):
            idxs = order[b * self.batch_size:(b + 1) * self.batch_size]
            plans = []
            for i in idxs:
                rng = np.random.default_rng((self.seed, epoch_idx, int(i)))
                p = self.dataset.sample_plan(int(i), rng)
                plans.append({
                    "ci": np.int32(self.vid_index[p["vid"]]),
                    "f_idx": p["f_idx"], "tops": p["tops"],
                    "lefts": p["lefts"], "aug": np.int32(p["aug"]),
                })
            stacked = {
                k: np.stack([p[k] for p in plans]) for k in plans[0]
            }
            if self._plan_sharding is not None:
                from ..parallel import put_global

                stacked = put_global(stacked, self._plan_sharding)
            else:
                stacked = jax.device_put(stacked)
            yield self._assemble(self._clips, self._maps, stacked)
