"""Mesh + category-parallel training tests on the 8-device CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssad_tpu.config import DataConfig, ModelConfig, OptimConfig, TrainConfig
from ssad_tpu.data.masks import pack_coords
from ssad_tpu.data.synthetic import SynthSpec
from ssad_tpu.parallel import mesh as mesh_mod
from ssad_tpu.parallel.category_parallel import (
    CategoryData,
    make_multi_category_step,
)


class TestMesh:
    def test_make_mesh_shapes(self):
        m = mesh_mod.make_mesh(n_model=2)
        assert m.shape["model"] == 2
        assert m.shape["data"] == len(jax.devices()) // 2

    def test_indivisible_raises(self):
        with pytest.raises(ValueError):
            mesh_mod.make_mesh(n_model=3, devices=jax.devices()[:8])

    def test_batch_sharding(self):
        m = mesh_mod.make_mesh(n_model=1)
        x = jnp.ones((16, 4))
        xs = mesh_mod.shard_batch(m, x)
        assert xs.sharding.spec == jax.sharding.PartitionSpec("data")


@pytest.mark.slow
class TestCategoryParallel:
    def _setup(self, n_model=2):
        mesh = mesh_mod.make_mesh(n_model=n_model)
        h = w = 64
        cfg = TrainConfig(
            data=DataConfig(imsize=(h, w), batch_size=8),
            model=ModelConfig(memory_bank_size=32, compute_dtype="float32"),
            optim=OptimConfig(),
        )
        spec = SynthSpec(subject="bottle", imsize=(h, w))
        init_fn, step_fn = make_multi_category_step(cfg, spec, mesh)

        rng = np.random.default_rng(0)
        mask = np.zeros((h, w), np.float32)
        mask[8:-8, 8:-8] = 1.0
        coords, count = pack_coords(mask.astype(np.uint8))
        from jax.sharding import NamedSharding, PartitionSpec as P

        ms = NamedSharding(mesh, P("model"))
        repl = NamedSharding(mesh, P())
        data = CategoryData(
            images=jax.device_put(
                jnp.asarray(rng.random((n_model, 4, h, w, 3), np.float32)), ms
            ),
            cut_pool=jax.device_put(jnp.asarray(rng.random((2, h, w, 3), np.float32)), repl),
            masks=jax.device_put(jnp.broadcast_to(jnp.asarray(mask), (n_model, h, w)), ms),
            coords=jax.device_put(
                jnp.broadcast_to(jnp.asarray(coords), (n_model,) + coords.shape), ms
            ),
            counts=jax.device_put(jnp.full((n_model,), count, jnp.int32), ms),
        )
        return mesh, init_fn, step_fn, data, ms

    def test_step_runs_and_is_sharded(self):
        mesh, init_fn, step_fn, data, ms = self._setup()
        state = init_fn(jax.random.key(0))
        # parameters sharded over the model axis
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        assert leaf.sharding.spec[0] == "model"
        keys = jax.device_put(jax.random.split(jax.random.key(1), 2), ms)
        state2, metrics = step_fn(state, keys, data, jnp.asarray(False))
        m = np.asarray(metrics)
        assert m.shape == (2, 2)
        assert np.isfinite(m).all()
        # categories evolve independently → different losses
        assert m[0, 0] != m[1, 0]

    def test_multiple_steps_stable(self):
        mesh, init_fn, step_fn, data, ms = self._setup()
        state = init_fn(jax.random.key(0))
        losses = []
        for i in range(6):
            keys = jax.device_put(jax.random.split(jax.random.key(i + 1), 2), ms)
            state, metrics = step_fn(state, keys, data, jnp.asarray(i > 3))
            losses.append(float(np.asarray(metrics)[:, 0].mean()))
        assert np.isfinite(losses).all()
        assert int(state.step) == 6
        # losses move (optimizer actually updates) but stay bounded
        assert losses[0] != losses[-1]
        assert max(losses) < 50.0


@pytest.mark.slow
class TestFitCategories:
    def test_two_categories_end_to_end(self, fake_mvtec, tmp_path):
        from ssad_tpu.data import mvtec
        from ssad_tpu.parallel.category_parallel import fit_categories
        from ssad_tpu.train import checkpoint as ckpt
        from ssad_tpu.evaluation import inference as inf

        cfg = TrainConfig(
            data=DataConfig(imsize=(64, 64), batch_size=8, min_dataset_length=16),
            model=ModelConfig(memory_bank_size=32, compute_dtype="float32"),
            optim=OptimConfig(projection_epochs=1, fine_tune_epochs=2),
        )
        mesh = mesh_mod.make_mesh(n_model=2)
        subjects = ["bottle", "carpet"]
        datas = [
            mvtec.prepare_pretext_data(fake_mvtec, s, imsize=(64, 64))
            for s in subjects
        ]
        results = fit_categories(cfg, subjects, datas, mesh, verbose=False)
        assert set(results) == {"bottle", "carpet"}
        # categories trained independently → different weights
        a = results["bottle"][0]["classifier"]["kernel"]
        b = results["carpet"][0]["classifier"]["kernel"]
        assert not np.allclose(a, b)
        # unstacked checkpoints load into the inference engine
        path = ckpt.save_checkpoint(
            tmp_path / "bottle", results["bottle"][0], results["bottle"][1],
            results["bottle"][2], cfg,
        )
        engine, bank, _ = inf.load_engine(path)
        logits, emb = engine.predict_batch(jnp.zeros((2, 64, 64, 3)))
        assert logits.shape == (2, 4) and emb.shape == (2, 512)


@pytest.mark.slow
class TestFitCategoriesTrainingParity:
    """The stacked trainer must carry the single-category Trainer's
    training-quality semantics: per-epoch val pass, loss/accuracy
    histories, best-val tracking, and epoch-granular kill-resume."""

    def _cfg(self):
        return TrainConfig(
            data=DataConfig(imsize=(64, 64), batch_size=8, min_dataset_length=16),
            model=ModelConfig(memory_bank_size=32, compute_dtype="float32"),
            optim=OptimConfig(
                projection_epochs=1, fine_tune_epochs=2,
                checkpoint_every_n_epochs=1, val_batches=1,
            ),
        )

    def test_history_best_and_kill_resume(self, fake_mvtec, tmp_path, monkeypatch):
        from ssad_tpu.data import mvtec
        from ssad_tpu.parallel import category_parallel as cp

        cfg = self._cfg()
        mesh = mesh_mod.make_mesh(n_model=1)
        datas = [mvtec.prepare_pretext_data(fake_mvtec, "bottle", imsize=(64, 64))]

        # baseline: uninterrupted run records full histories + best
        base = cp.fit_categories(cfg, ["bottle"], datas, mesh, verbose=False)[
            "bottle"
        ]
        h = base.history
        for key, n in (
            ("projection_train_loss", 1), ("projection_val_loss", 1),
            ("fine_tune_train_loss", 2), ("fine_tune_train_accuracy", 2),
            ("fine_tune_val_loss", 2), ("fine_tune_val_accuracy", 2),
        ):
            assert len(h[key]) == n, key
        assert base.best_params is not None
        assert np.isfinite(base.best_val_loss)

        # kill right after the first fine-tune epoch's snapshot lands
        resume_dir = str(tmp_path / "resume")
        real_save = cp._save_group_snapshot

        class Kill(RuntimeError):
            pass

        def killing_save(path, stage, epoch, *a, **kw):
            real_save(path, stage, epoch, *a, **kw)
            if stage == "fine_tune" and epoch == 1:
                raise Kill()

        monkeypatch.setattr(cp, "_save_group_snapshot", killing_save)
        with pytest.raises(Kill):
            cp.fit_categories(cfg, ["bottle"], datas, mesh, verbose=False,
                              resume_dir=resume_dir)
        monkeypatch.setattr(cp, "_save_group_snapshot", real_save)

        resumed = cp.fit_categories(cfg, ["bottle"], datas, mesh, verbose=False,
                                    resume_dir=resume_dir)["bottle"]
        # the snapshot captured the FULL state (params, opt, bank, rng,
        # histories, best) → the resumed run equals the uninterrupted one
        for a, b in zip(jax.tree_util.tree_leaves(base.params),
                        jax.tree_util.tree_leaves(resumed.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
        np.testing.assert_allclose(
            resumed.history["fine_tune_train_loss"],
            h["fine_tune_train_loss"], atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(resumed.bank.data), np.asarray(base.bank.data), atol=1e-6
        )
        assert resumed.best_val_loss == pytest.approx(base.best_val_loss, abs=1e-6)

    def test_resume_snapshot_mismatch_fails_loud(self, fake_mvtec, tmp_path):
        """The snapshot path is keyed by subject names only; a rerun
        with a different --stack/backbone must get a clear error, not
        an opaque shape failure from restoring incompatible stacked
        leaves."""
        import pickle

        from ssad_tpu.data import mvtec
        from ssad_tpu.parallel import category_parallel as cp

        cfg = self._cfg()
        mesh = mesh_mod.make_mesh(n_model=1)
        datas = [mvtec.prepare_pretext_data(fake_mvtec, "bottle", imsize=(64, 64))]
        resume_dir = tmp_path / "resume"
        snap = cp._group_snapshot_path(str(resume_dir), ["bottle"])
        snap.parent.mkdir(parents=True)
        snap.write_bytes(pickle.dumps({
            "stage": "fine_tune", "epoch": 1, "state": None, "rng": None,
            "histories": {}, "best": {}, "stack": 4, "backbone": "resnet18",
        }))
        with pytest.raises(SystemExit, match="stack=4"):
            cp.fit_categories(cfg, ["bottle"], datas, mesh, verbose=False,
                              resume_dir=str(resume_dir))


@pytest.mark.slow
class TestStackedSingleEquivalence:
    """Stacked n_model=1 and the single-category Trainer are the same
    math: identical params + key -> identical batch, loss and update."""

    def _cfg(self):
        return TrainConfig(
            data=DataConfig(imsize=(64, 64), batch_size=8, min_dataset_length=16),
            model=ModelConfig(memory_bank_size=32, compute_dtype="float32"),
            optim=OptimConfig(),
        )

    def test_one_step_matches(self, fake_mvtec):
        from ssad_tpu.data import mvtec
        from ssad_tpu.parallel.category_parallel import (
            StackedState,
            stack_category_data,
        )
        from ssad_tpu.train.trainer import Trainer, _epoch_steps

        cfg = self._cfg()
        data = mvtec.prepare_pretext_data(fake_mvtec, "bottle", imsize=(64, 64))
        trainer = Trainer(cfg, data)
        state = trainer.init_state(jax.random.key(0), "fine_tune")
        train_step, _, _, steps = trainer._get_step_fns("fine_tune")
        assert steps == _epoch_steps(
            data.train_images.shape[0], cfg.data.min_dataset_length,
            cfg.data.batch_size,
        )

        mesh = mesh_mod.make_mesh(n_model=1)
        _, step_fn = make_multi_category_step(
            trainer.cfg, trainer.spec, mesh, stage="fine_tune",
            steps_per_epoch=steps,
        )
        stack = lambda t: jax.tree_util.tree_map(lambda a: jnp.asarray(a)[None], t)
        stacked = StackedState(
            params=stack(state.params),
            batch_stats=stack(state.batch_stats),
            opt_state=stack(state.opt_state),
            bank=stack(state.bank),
            step=state.step + 0,  # copy: state.step is donated below
        )
        cat_data = stack_category_data([data], mesh)

        k = jax.random.key(7)
        tr = trainer._device_data("train")
        new_single, metrics_single = train_step(state, k, *tr, jnp.asarray(False))
        new_stacked, metrics_stacked = step_fn(
            stacked, k[None], cat_data, jnp.asarray(False)
        )

        # identical keys → identical synthesized batch; residual diffs
        # come from sharded BatchNorm batch-stat reduction order through
        # the bf16 synthesis pipeline (~1e-4 relative on the loss)
        m = np.asarray(metrics_stacked)[0]
        np.testing.assert_allclose(m[0], float(metrics_single["loss"]), rtol=5e-3)
        np.testing.assert_allclose(
            np.asarray(new_stacked.params["classifier"]["kernel"])[0],
            np.asarray(new_single.params["classifier"]["kernel"]),
            rtol=5e-3, atol=5e-4,
        )


@pytest.mark.slow
class TestSingleCategoryDataParallel:
    """Trainer(mesh=...) shards the batch over 'data'; gradients must
    match the unsharded run (XLA all-reduce is the identity here)."""

    def test_gradients_match_unsharded(self, fake_mvtec):
        from ssad_tpu.data import mvtec
        from ssad_tpu.train.trainer import Trainer

        cfg = TrainConfig(
            data=DataConfig(imsize=(64, 64), batch_size=8, min_dataset_length=16),
            model=ModelConfig(memory_bank_size=32, compute_dtype="float32"),
            optim=OptimConfig(),
        )
        data = mvtec.prepare_pretext_data(fake_mvtec, "bottle", imsize=(64, 64))
        mesh = mesh_mod.make_mesh(n_model=1)

        results = {}
        for name, m in (("plain", None), ("dp", mesh)):
            trainer = Trainer(cfg, data, mesh=m)
            state = trainer.init_state(jax.random.key(0), "fine_tune")
            step, _, _, _ = trainer._get_step_fns("fine_tune")
            tr = trainer._device_data("train")
            new_state, metrics = step(
                state, jax.random.key(3), *tr, jnp.asarray(False)
            )
            results[name] = (
                float(metrics["loss"]),
                np.asarray(new_state.params["classifier"]["kernel"]),
            )
        # sharded-BN reduction order through the bf16 synthesis pipeline
        # bounds agreement at ~1e-4 relative; anything tighter would be
        # asserting bit-identical reduction trees, which DP changes
        np.testing.assert_allclose(results["plain"][0], results["dp"][0], rtol=5e-3)
        np.testing.assert_allclose(
            results["plain"][1], results["dp"][1], rtol=5e-3, atol=5e-4
        )


@pytest.mark.slow
class TestStackLargerThanMesh:
    """stack_size can exceed the mesh 'model' extent: each model shard
    carries several categories (needed to stack categories on 1 chip)."""

    def test_step_with_stack_4_on_model_2(self):
        mesh = mesh_mod.make_mesh(n_model=2)
        h = w = 64
        stack = 4
        cfg = TrainConfig(
            data=DataConfig(imsize=(h, w), batch_size=8),
            model=ModelConfig(memory_bank_size=32, compute_dtype="float32"),
            optim=OptimConfig(),
        )
        spec = SynthSpec(subject="bottle", imsize=(h, w))
        init_fn, step_fn = make_multi_category_step(
            cfg, spec, mesh, stage="projection", stack_size=stack
        )
        rng = np.random.default_rng(0)
        mask = np.zeros((h, w), np.float32)
        mask[8:-8, 8:-8] = 1.0
        coords, count = pack_coords(mask.astype(np.uint8))
        from jax.sharding import NamedSharding, PartitionSpec as P

        ms = NamedSharding(mesh, P("model"))
        repl = NamedSharding(mesh, P())
        data = CategoryData(
            images=jax.device_put(
                jnp.asarray(rng.random((stack, 4, h, w, 3), np.float32)), ms
            ),
            cut_pool=jax.device_put(
                jnp.asarray(rng.random((2, h, w, 3), np.float32)), repl
            ),
            masks=jax.device_put(
                jnp.broadcast_to(jnp.asarray(mask), (stack, h, w)), ms
            ),
            coords=jax.device_put(
                jnp.broadcast_to(jnp.asarray(coords), (stack,) + coords.shape), ms
            ),
            counts=jax.device_put(jnp.full((stack,), count, jnp.int32), ms),
        )
        state = init_fn(jax.random.key(0))
        assert jax.tree_util.tree_leaves(state.params)[0].shape[0] == stack
        keys = jax.device_put(jax.random.split(jax.random.key(1), stack), ms)
        state2, metrics = step_fn(state, keys, data, jnp.asarray(False))
        m = np.asarray(metrics)
        assert m.shape == (stack, 2) and np.isfinite(m).all()
        # all four categories evolve independently
        assert len(set(np.round(m[:, 0], 6))) > 1


class TestSingleProcessDistributedHelpers:
    """Single-process behavior of the multi-controller exit-path pieces
    (the two-process composition is covered end-to-end by
    test_multiprocess.py::test_cli_train_multi_two_processes)."""

    def test_barrier_is_noop_single_process(self):
        from ssad_tpu.parallel import distributed as dist

        assert not dist.is_multiprocess()
        dist.barrier("ssad:test", timeout_s=0.1)  # returns immediately

    def test_checkpointer_single_process_is_plain_pytree(self):
        import orbax.checkpoint as ocp

        from ssad_tpu.train.checkpoint import _checkpointer

        ckptr = _checkpointer()
        assert isinstance(ckptr, ocp.Checkpointer)
