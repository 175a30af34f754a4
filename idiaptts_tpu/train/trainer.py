"""ModularTrainer: the experiment lifecycle front door.

Capability parity with ``model_trainers/ModularTrainer.py`` (:39-1119):
id-list splitting (:95-117), datareader/dataset setup (:258-297),
init/checkpoint policy (:187-251), train loop with best-model tracking
(:379-517), ``forward``/``synth``/``gen_figure``/``benchmark`` batched
inference front doors (:617-791), ``_forward_batched`` (:814-887),
vocoder dispatch ``gen_waveform`` (:1014-1085) and ``copy_synth``
(:1093-1119).
"""

import logging
import math
import os
import random
import time

import numpy as np

from idiaptts_tpu.data.dataset import (DatareadersDataset, batch_decollate,
                                       collate_batch)
from idiaptts_tpu.hparams import ExtendedHParams
from idiaptts_tpu.train.handler import ModularModelHandler

logger = logging.getLogger(__name__)


class ModularTrainer:
    """Generic trainer around one model handler."""

    def __init__(self, hparams, id_list=None, data_reader_configs=None):
        self.hparams = hparams
        # Startup provenance logging (ModularTrainer.py:48-49 role).
        from idiaptts_tpu.utils.misc import log_git_hash
        log_git_hash()
        seed = hparams.get("seed")
        if seed is not None:
            random.seed(seed)
            np.random.seed(seed)
        self.model_handler = ModularModelHandler()
        self.data_reader_configs = data_reader_configs
        self.datareaders = {}
        self.dataset_train = None
        self.dataset_val = None
        self.dataset_test = None
        self.loss_configs = []
        self.total_epoch = 0
        self.best_loss = np.inf
        self.train_losses = []       # [(loss_dict, epoch)]
        self.validation_losses = []
        self.logger = logger
        if id_list is not None:
            self._setup_id_lists(id_list, hparams)
        else:
            self.id_list_train = self.id_list_val = self.id_list_test = []

    # -- id lists ---------------------------------------------------------
    def _setup_id_lists(self, id_list, hparams):
        """Split into train/val/test by percentage or accept explicit
        dict splits (ModularTrainer.py:95-117 role)."""
        if isinstance(id_list, dict):
            self.id_list_train = list(id_list.get("train", []))
            self.id_list_val = list(id_list.get("val", []))
            self.id_list_test = list(id_list.get("test", []))
            return
        id_list = [str(i).strip() for i in id_list if str(i).strip()]
        if hparams.get("seed") is not None:
            rng = random.Random(hparams.seed)
            id_list = sorted(id_list)
            rng.shuffle(id_list)
        num = len(id_list)
        num_test = int(num * hparams.get("test_set_perc", 0.05))
        num_val = int(num * hparams.get("val_set_perc", 0.05))
        self.id_list_test = id_list[:num_test]
        self.id_list_val = id_list[num_test:num_test + num_val]
        self.id_list_train = id_list[num_test + num_val:]

    # -- init -------------------------------------------------------------
    def init(self, hparams, model_config=None, loss_configs=None,
             data_reader_configs=None):
        if data_reader_configs is not None:
            self.data_reader_configs = data_reader_configs
            self._setup_datareaders(hparams)
            self._setup_datasets(hparams)
        elif not self.datareaders:
            self._setup_datareaders(hparams)
            self._setup_datasets(hparams)
        self.loss_configs = loss_configs or []
        self._setup_summary_writer(hparams)

        # Model: load checkpoint or create fresh (:187-251 policy).
        checkpoint_dir = self._model_dir(hparams)
        loaded = False
        if hparams.get("load_from_checkpoint") \
                or hparams.get("load_newest_checkpoint"):
            try:
                best_loss, epoch, _ = self.model_handler.load_checkpoint(
                    hparams.out_dir, hparams.model_name,
                    epoch=hparams.get("epoch_to_load"),
                    step=hparams.get("step_to_load"),
                    load_optimiser=False, load_scheduler=False,
                    ignore_layers=hparams.get("ignore_layers", []),
                    layer_map=hparams.get("layer_map", []),
                    networks_dir=hparams.get("networks_dir", "nn"))
                if best_loss is not None:
                    self.best_loss = best_loss
                if epoch is not None:
                    self.total_epoch = epoch
                loaded = True
            except FileNotFoundError:
                if hparams.get("load_from_checkpoint"):
                    raise
        if not loaded:
            if model_config is None:
                raise ValueError("model_config required for a new model")
            example = self._example_batch(hparams)
            self.model_handler.create_model(model_config, hparams,
                                            example_batch=example)
        model_parallel = hparams.get("model_parallel", 1) or 1
        if hparams.get("use_gpu") or hparams.get("num_devices", 1) > 1 \
                or model_parallel > 1:
            self.model_handler.setup_mesh(
                hparams.get("num_devices"),
                model_parallel=model_parallel,
                use_shard_map=hparams.get("use_shard_map", "auto"))
        self.model_handler.set_optimiser(hparams)
        self.model_handler.set_scheduler(hparams)
        self.model_handler.set_losses(self.loss_configs)
        names = hparams.get("backprop_loss_names")
        self.model_handler.backprop_loss_names = \
            tuple(names) if names else None
        self.model_handler.set_ema(hparams)
        self.model_handler.checkpoint_backend = hparams.get(
            "checkpoint_backend") or "msgpack"
        if loaded and (hparams.get("load_optimiser")
                       or hparams.get("load_scheduler")):
            try:
                self.model_handler.load_checkpoint(
                    hparams.out_dir, hparams.model_name,
                    epoch=hparams.get("epoch_to_load"),
                    step=hparams.get("step_to_load"),
                    load_optimiser=hparams.get("load_optimiser", True),
                    load_scheduler=hparams.get("load_scheduler", True),
                    networks_dir=hparams.get("networks_dir", "nn"))
            except FileNotFoundError:
                pass
        self._log_model_summary()
        return self

    def _setup_summary_writer(self, hparams):
        """TensorBoard scalars + hparams text (ModularTrainer.py:198-214
        and ModularModelHandlerPyTorch.py:694-705, 858-867 role)."""
        self.summary_writer = None
        if not hparams.get("out_dir") or not hparams.get("model_name"):
            return
        try:
            from tensorboardX import SummaryWriter
            log_dir = os.path.join(hparams.out_dir, hparams.model_name,
                                   "tensorboard")
            self.summary_writer = SummaryWriter(log_dir=log_dir)
            self.summary_writer.add_text(
                "hparams", hparams.get_debug_string())
        except Exception as e:  # noqa: BLE001 - logging only
            logger.warning("TensorBoard writer unavailable: %s", e)

    def _log_model_summary(self):
        """Parameter-count summary as TB text (the torchinfo-summary
        role, ModularTrainer.py:389-394)."""
        if self.model_handler.params is None \
                or self.summary_writer is None:
            return
        try:
            import jax
            lines = []
            flat = jax.tree_util.tree_flatten_with_path(
                self.model_handler.params)[0]
            total = 0
            for path, leaf in flat:
                name = "/".join(str(p.key) for p in path
                                if hasattr(p, "key"))
                lines.append("{}: {} = {}".format(
                    name, tuple(leaf.shape), leaf.size))
                total += leaf.size
            lines.append("TOTAL: {} parameters".format(total))
            self.summary_writer.add_text("model_summary",
                                         "\n".join(lines))
            logger.info("Model has %d parameters.", total)
        except Exception:
            pass

    def _log_scalar(self, tag, value, step):
        if getattr(self, "summary_writer", None) is not None:
            try:
                self.summary_writer.add_scalar(tag, value, step)
            except Exception:
                pass

    def _model_dir(self, hparams):
        if hparams.get("out_dir") and hparams.get("model_name"):
            return os.path.join(hparams.out_dir, hparams.model_name,
                                hparams.get("networks_dir", "nn"))
        return None

    def _setup_datareaders(self, hparams):
        self.datareaders = {}
        for config in (self.data_reader_configs or []):
            reader = config.create_reader()
            self.datareaders[reader.name] = reader

    def _setup_datasets(self, hparams):
        """Dataset class chosen by name via hparams.dataset_type
        (ExtendedHParams.py:190 / ModularTrainer.py:288-297 role)."""
        readers = list(self.datareaders.values())
        if not readers:
            raise ValueError(
                "No datareaders configured — set up DataReaderConfigs "
                "before _setup_datasets (datasets would stay None and "
                "fail later in training).")
        dataset_type = hparams.get("dataset_type",
                                   "DatareadersDataset")
        if dataset_type in ("WindowingDatareadersDataset",
                            "PyTorchWindowingDatareadersDataset"):
            from idiaptts_tpu.data.dataset import \
                WindowingDatareadersDataset
            cls = WindowingDatareadersDataset
        else:
            cls = DatareadersDataset
        self.dataset_train = cls(self.id_list_train, readers)
        self.dataset_val = cls(self.id_list_val, readers,
                               random_select=False)
        self.dataset_test = cls(self.id_list_test, readers,
                                               random_select=False)

    def _example_batch(self, hparams, id_list=None):
        ids = id_list or (self.id_list_train or self.id_list_val
                          or self.id_list_test)
        if not ids:
            raise ValueError("No utterance ids available to build an "
                             "example batch — id lists are empty.")
        if self.dataset_train is None:
            raise ValueError("Datasets are not initialised — call "
                             "_setup_datasets before _example_batch.")
        sample, _ = self.dataset_train.get_id_name(ids[0])
        return collate_batch([sample])

    # -- batching ---------------------------------------------------------
    def _batches(self, dataset, id_list, batch_size, shuffle=False,
                 seed=0, prefetch=2):
        """Batch iterator with background-thread prefetch: host-side
        loading/collating overlaps device compute (the reference's
        DataLoader-worker role, SURVEY.md §2.8 async host->device)."""
        # Datasets may expand utterances into several work items (the
        # windowing dataset yields one item per window) — batch over
        # items so window_size/window_step actually apply in training.
        if hasattr(dataset, "work_items"):
            ids = list(dataset.work_items(id_list))
            fetch = dataset.get_work_item
        else:
            ids = list(id_list)
            fetch = dataset.get_id_name
        if shuffle:
            random.Random(seed).shuffle(ids)

        def produce():
            for start in range(0, len(ids), batch_size):
                chunk = ids[start:start + batch_size]
                samples = [fetch(i)[0] for i in chunk]
                yield collate_batch(samples)

        if prefetch and prefetch > 0:
            import queue
            import threading
            q = queue.Queue(maxsize=prefetch)
            stop = object()
            cancelled = threading.Event()
            # Producer exceptions must propagate to the consumer (the
            # reference's DataLoader re-raises worker errors,
            # ModularModelHandlerPyTorch.py:683); otherwise a bad npz would
            # silently truncate the epoch.
            error = []

            def worker():
                try:
                    for batch in produce():
                        # Bounded put so an abandoned consumer (epoch
                        # loop raised / KeyboardInterrupt) releases the
                        # thread instead of leaking it blocked on a
                        # full queue.
                        while not cancelled.is_set():
                            try:
                                q.put(batch, timeout=1.0)
                                break
                            except queue.Full:
                                continue
                        if cancelled.is_set():
                            return
                except BaseException as exc:  # noqa: BLE001 - re-raised below
                    error.append(exc)
                finally:
                    # The stop sentinel MUST reach the consumer (a
                    # full queue would otherwise deadlock it); retry
                    # until delivered or the consumer cancelled.
                    while not cancelled.is_set():
                        try:
                            q.put(stop, timeout=1.0)
                            break
                        except queue.Full:
                            continue

            thread = threading.Thread(target=worker, daemon=True)
            thread.start()
            try:
                while True:
                    batch = q.get()
                    if batch is stop:
                        break
                    yield batch
                thread.join()
                if error:
                    raise error[0]
            finally:
                cancelled.set()
        else:
            yield from produce()

    # -- training ---------------------------------------------------------
    def train(self, hparams):
        """Epoch loop with validation, best-model checkpointing and
        final-model policy (:379-517 role)."""
        hparams.verify()
        profiler_dir = hparams.get("profiler_dir")
        if profiler_dir:
            # JAX profiler trace (xplane) — the tracing/profiling hook
            # the reference lacks (SURVEY.md §5).
            import jax
            jax.profiler.start_trace(profiler_dir)
        t_start = time.time()
        batch_size = hparams.get("batch_size_train", 1)
        epochs = hparams.get("epochs", 0)
        all_loss = []
        all_loss_train = []

        try:
            return self._train_epochs(hparams, batch_size, epochs,
                                      all_loss, all_loss_train,
                                      t_start)
        finally:
            if profiler_dir:
                import jax
                jax.profiler.stop_trace()

    def _train_epochs(self, hparams, batch_size, epochs, all_loss,
                      all_loss_train, t_start):
        if hparams.get("start_with_test") or epochs == 0:
            loss, _ = self.model_handler.process_batches(
                self._batches(self.dataset_val or self.dataset_train,
                              self.id_list_val or self.id_list_train,
                              hparams.get("batch_size_val", batch_size)),
                training=False)
            logger.info("Pre-training validation loss: %f", loss)
            all_loss.append(loss)
            if loss < self.best_loss and not math.isnan(loss):
                self.best_loss = loss
                self._save(hparams, best=True)

        for epoch in range(1, epochs + 1):
            self.total_epoch += 1
            epoch_seed = (hparams.get("seed") or 0) + self.total_epoch
            try:
                train_loss, per_loss = \
                    self.model_handler.process_batches(
                        self._batches(self.dataset_train,
                                      self.id_list_train,
                                      batch_size,
                                      shuffle=hparams.get(
                                          "shuffle_train_set", True),
                                      seed=epoch_seed),
                        training=True, current_epoch=self.total_epoch)
            except ValueError as e:
                if "NaN" not in str(e):
                    raise
                # Graceful NaN stop (ModularTrainer.py:458-470 role):
                # fall through to the best-model reload / final save.
                logger.error("Train loss is NaN, stopping: %s", e)
                break
            all_loss_train.append(train_loss)
            self.record_train_loss(per_loss, self.total_epoch)
            logger.info("Epoch %d train loss: %f", self.total_epoch,
                        train_loss)
            self._log_scalar("loss/train", train_loss, self.total_epoch)
            for name, value in per_loss.items():
                self._log_scalar("loss/train_" + name, value,
                                 self.total_epoch)
            if math.isnan(train_loss):
                logger.error("Train loss is NaN, stopping.")
                break
            if self.model_handler.scheduler is not None and \
                    not self.model_handler.iterations_per_scheduler_step:
                # run_scheduler semantics (ModularModelHandlerPyTorch.py
                # :927-951): the scheduler advances once every
                # epochs_per_scheduler_step epochs, indexed by the number
                # of scheduler steps taken.
                eps = self.model_handler.epochs_per_scheduler_step or 1
                if self.total_epoch % eps == 0:
                    self.model_handler.scheduler.on_epoch(
                        self.total_epoch // eps)

            if hparams.get("epochs_per_test", 1) > 0 and \
                    self.total_epoch % hparams.get("epochs_per_test",
                                                   1) == 0:
                val_loss, val_per_loss = self.model_handler \
                    .process_batches(
                        self._batches(
                            self.dataset_val or self.dataset_train,
                            self.id_list_val or self.id_list_train,
                            hparams.get("batch_size_val", batch_size),
                            shuffle=hparams.get("shuffle_val_set",
                                                False),
                            seed=epoch_seed),
                        training=False)
                all_loss.append(val_loss)
                self.record_validation_loss(val_per_loss,
                                            self.total_epoch)
                logger.info("Epoch %d validation loss: %f",
                            self.total_epoch, val_loss)
                self._log_scalar("loss/val", val_loss, self.total_epoch)
                if self.model_handler.scheduler is not None:
                    # scheduler_loss_names (run_scheduler :927-951
                    # role): the plateau metric can track a subset of
                    # the named losses instead of the summed total.
                    sched_names = hparams.get("scheduler_loss_names")
                    metric = sum(val_per_loss[n] for n in sched_names) \
                        if sched_names else val_loss
                    self.model_handler.scheduler.on_metric(metric)
                if val_loss < self.best_loss and not math.isnan(val_loss):
                    self.best_loss = val_loss
                    self._save(hparams, best=True)
            if hparams.get("checkpoint_epoch_interval") and \
                    self.total_epoch % hparams.checkpoint_epoch_interval \
                    == 0 and hparams.get("out_dir"):
                self._save(hparams, epoch=self.total_epoch)

        if hparams.get("use_best_as_final_model") and epochs > 0 \
                and hparams.get("out_dir"):
            try:
                best_loss, _, _ = self.model_handler.load_checkpoint(
                    hparams.out_dir, hparams.model_name, best=True,
                    load_optimiser=False, load_scheduler=False,
                    networks_dir=hparams.get("networks_dir", "nn"))
                logger.info("Reloaded best model (loss %s)",
                            self.best_loss)
            except FileNotFoundError:
                pass
        if hparams.get("save_final_model") and hparams.get("out_dir"):
            self._save(hparams, last=True)
        logger.info("Training took %.1f s", time.time() - t_start)
        return all_loss, all_loss_train

    def _save(self, hparams, epoch=None, best=False, last=False):
        if not hparams.get("out_dir"):
            return
        self.model_handler.save_checkpoint(
            hparams.out_dir, hparams.model_name, epoch=epoch, best=best,
            last=last, best_loss=self.best_loss,
            networks_dir=hparams.get("networks_dir", "nn"))

    # -- evaluation front doors -------------------------------------------
    def test(self, hparams, id_list=None):
        ids = id_list or self.id_list_test
        loss, per_loss = self.model_handler.process_batches(
            self._batches(self.dataset_test or self.dataset_train, ids,
                          hparams.get("batch_size_test", 48)),
            training=False)
        logger.info("Test loss: %f", loss)
        return loss

    def forward(self, hparams, id_list, input_only=True):
        """Batched inference -> {id: output dict} with post-processing
        (:617-686 role).  With ``input_only`` the dataset is built from
        the model-input readers alone, so unseen utterances without
        target features can be synthesised.  ``id_list`` accepts a
        list/tuple of ids, a single id, or a file-id-list path."""
        return self._forward_batched(
            hparams, self._input_to_str_list(id_list),
            hparams.get("batch_size_val", 48), input_only=input_only)

    def _model_input_names(self):
        config = self.model_handler.model_config
        names = set()

        def collect(cfg):
            if cfg is None:
                return
            # all_input_names covers side inputs too (e.g. the VTLN
            # layer's alpha_input_names) — forward(input_only=True)
            # must keep their readers.
            getter = getattr(cfg, "all_input_names", None)
            for name in (getter() if callable(getter)
                         else (getattr(cfg, "input_names", None) or ())):
                names.add(name)
            for attr in ("module_configs",):
                for sub in getattr(cfg, attr, []) or []:
                    collect(sub)

        collect(config)
        return names

    def _forward_batched(self, hparams, id_list, batch_size,
                         post_process=True, input_only=False):
        readers = list(self.datareaders.values())
        if input_only:
            wanted = self._model_input_names()
            filtered = [r for r in readers
                        if r.name in wanted
                        or any(n in wanted for n in r.output_names)]
            if filtered:
                readers = [_inference_clone(r) for r in filtered]
            dataset = DatareadersDataset(id_list, readers,
                                         random_select=False)
        else:
            # Deterministic full-length samples: benchmark/gen_figure
            # must not inherit the training dataset's random
            # max_frames crops (compute_score compares frame-by-frame
            # against full-length originals).
            dataset = DatareadersDataset(
                id_list,
                [_inference_clone(r) if getattr(r, "max_frames", None)
                 else r for r in readers],
                random_select=False)
        results = {}
        for start in range(0, len(id_list), batch_size):
            chunk = list(id_list)[start:start + batch_size]
            samples = [dataset.get_id_name(i)[0] for i in chunk]
            batch = collate_batch(samples)
            out = self.model_handler.inference(batch)
            merged = dict(batch)
            merged.update({k: v for k, v in out.items()
                           if isinstance(v, np.ndarray)})
            # Per-feature lengths for output trimming.  Model outputs
            # take the lengths of the batch feature with the same
            # padded time axis, so multi-rate batches (frame-rate
            # conditioning + sample-rate waveform) trim correctly.
            first_len_key = next(iter(batch["_lengths"]))
            lengths = {}
            for k, v in merged.items():
                if k.startswith("_"):
                    continue
                if k in batch["_lengths"]:
                    lengths[k] = batch["_lengths"][k]
                    continue
                time_dim = v.shape[1] if getattr(v, "ndim", 0) > 1 \
                    else None
                match = next(
                    (lk for lk in batch["_lengths"]
                     if lk in batch
                     and getattr(batch[lk], "ndim", 0) > 1
                     and batch[lk].shape[1] == time_dim), None)
                lengths[k] = batch["_lengths"][match or first_len_key]
            decollated = batch_decollate(merged, lengths=lengths)
            for id_name, sample in zip(chunk, decollated):
                if post_process:
                    sample = self._postprocess_sample(sample)
                results[id_name] = sample
        return results

    def _postprocess_sample(self, sample):
        """Map output names through reader postprocessing
        (post_processing_mapping role)."""
        mapping = getattr(self, "post_processing_mapping", None)
        if not mapping:
            return sample
        out = dict(sample)
        for output_name, reader_name in mapping.items():
            if output_name in out and reader_name in self.datareaders:
                out[output_name] = self.datareaders[
                    reader_name].postprocess_sample(out[output_name])
        return out

    def synth(self, hparams, id_list):
        """Predict features and synthesise waveforms (:644-676 role)."""
        results = self._forward_batched(
            hparams, self._input_to_str_list(id_list),
            hparams.get("batch_size_synth", 12), input_only=True)
        return self.gen_waveform(hparams, results)

    def copy_synth(self, hparams, id_list):
        """Synthesise from original (ground-truth) features
        (:1093-1119 role): reader outputs are denormalised via their
        reader and exposed under the PREDICTION keys of
        post_processing_mapping, so gen_waveform sees the same shape
        of sample a forward pass would produce."""
        mapping = getattr(self, "post_processing_mapping", {}) or {}
        dataset = DatareadersDataset(
            id_list, [_inference_clone(r)
                      for r in self.datareaders.values()],
            random_select=False)
        results = {}
        for id_name in id_list:
            sample, _ = dataset.get_id_name(id_name)
            out = {k: v for k, v in sample.items()}
            for pred_key, reader_name in mapping.items():
                reader = self.datareaders.get(reader_name)
                if reader is None:
                    continue
                source = next((n for n in reader.output_names
                               if n in sample), None)
                if source is not None:
                    out[pred_key] = reader.postprocess_sample(
                        sample[source])
            results[id_name] = out
        return self.gen_waveform(hparams, results)

    def gen_waveform(self, hparams, results):
        """Vocoder dispatch — overridden by task trainers
        (:1014-1085 role)."""
        raise NotImplementedError(
            "gen_waveform must be implemented by the task trainer.")

    def benchmark(self, hparams, id_list=None):
        # Falsy input (None or empty) falls back to the test split,
        # matching the pre-existing `id_list or self.id_list_test`.
        ids = self._input_to_str_list(id_list) if id_list \
            else self.id_list_test
        results = self._forward_batched(
            hparams, ids, hparams.get("batch_size_benchmark", 48))
        return self.compute_score(hparams, results)

    def compute_score(self, hparams, results):
        raise NotImplementedError(
            "compute_score must be implemented by the task trainer.")

    def gen_figure(self, hparams, id_list):
        """Figure generation via DataPlotter (:889-937 role)."""
        results = self._forward_batched(
            hparams, self._input_to_str_list(id_list),
            hparams.get("batch_size_gen_figure", 48))
        paths = []
        for id_name, sample in results.items():
            paths.append(self.gen_figure_from_output(
                id_name, sample, hparams))
        return paths

    def gen_figure_from_output(self, id_name, sample, hparams):
        """Default multi-grid figure (ModularTrainer.py:889-937 role):
        wide 2-D features become spectrogram-style images, narrow 2-D
        features become per-column curve overlays, 1-D features single
        curves; binary-looking columns are drawn as shaded areas (the
        reference's vuv overlay style)."""
        from idiaptts_tpu.utils.plotter import DataPlotter
        out_dir = hparams.get("synth_dir") or hparams.get("out_dir") \
            or "."
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, "{}{}".format(
            id_name, hparams.get("gen_figure_ext", ".pdf")))
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        grid = 0
        with DataPlotter() as plotter:
            plotter.set_title("{} - {}".format(
                id_name, os.path.basename(
                    hparams.get("model_name") or "")))
            for key, value in sorted(sample.items()):
                if not isinstance(value, np.ndarray) or value.size == 0 \
                        or np.iscomplexobj(value):
                    continue
                if value.ndim == 1:
                    value = value[:, None]
                if value.ndim != 2:
                    continue
                if value.shape[1] > 4:
                    # Wide feature (coded sp, questions, ...): image
                    # view.  DataPlotter expects (T, bins); transpose
                    # only when the array looks bins-major.
                    plotter.set_spec_data(grid, value
                                          if value.shape[0] > value.shape[1]
                                          else value.T, label=key)
                    grid += 1
                    continue
                curves, areas = [], []
                for col in range(value.shape[1]):
                    column = value[:, col]
                    name = key if value.shape[1] == 1 \
                        else "{}[{}]".format(key, col)
                    if np.isin(np.round(column), (0.0, 1.0)).all():
                        areas.append((np.round(column), "gray", 0.2, name))
                    else:
                        curves.append((column, name))
                if areas:
                    plotter.set_area_list(grid, areas)
                if curves:
                    plotter.set_data_list(grid, curves)
                if curves or areas:
                    plotter.set_label(grid, xlabel="frames", ylabel=key)
                    grid += 1
            if grid:
                plotter.gen_plot()
                plotter.save_to_file(path)
        return path

    @staticmethod
    def create_hparams(hparams_string=None, verbose=False):
        return ExtendedHParams.create_hparams(hparams_string, verbose)

    # -- reference-surface helpers (ModularTrainer.py:119-1012) -----------
    def sanity_check_train(self, hparams):
        """Pre-training checks (:519-536 role)."""
        assert self.model_handler is not None, \
            "The init function has not been called before training."
        hparams.verify()
        eps = hparams.get("epochs_per_scheduler_step")
        ept = hparams.get("epochs_per_test", 1)
        if eps:
            if ept > eps:
                logger.warning("Model is validated only every %d epochs"
                               " but scheduler runs every %d.", ept, eps)
            if ept % eps != 0:
                logger.warning("epochs_per_test %% "
                               "epochs_per_scheduler_step != 0.")

    @staticmethod
    def id_list_to_str(id_list):
        return " ".join(
            os.path.join(os.path.split(os.path.dirname(i))[-1],
                         os.path.splitext(os.path.basename(i))[0])
            for i in id_list)

    @staticmethod
    def _input_to_str_list(input):
        """Flexible id input -> list of id strings: a path to a
        file-id-list file, a single id string, or a list/tuple of ids
        (ModularTrainer.py:794-812 semantics)."""
        if isinstance(input, str):
            try:
                with open(input) as f:
                    return [s.strip(" \t\n\r") for s in f.readlines()
                            if s.strip(" \t\n\r")]
            except IOError:
                return [input]
        if isinstance(input, (list, tuple)):
            return [str(s) for s in input]
        raise ValueError("Unknown input {} of type {}.".format(
            input, type(input)))

    @staticmethod
    def split_batch(data, seq_lengths, batch_first=True):
        """Split every batched array in ``data`` into per-utterance
        arrays trimmed to its reader's lengths
        (ModularTrainer.py:127-130)."""
        return {k: ModularTrainer._split_return_values(
                    v, seq_lengths[k], batch_first=batch_first)
                for k, v in data.items()}

    @classmethod
    def _split_return_values(cls, input_values, seq_length_output,
                             permutation=None, batch_first=False):
        """Batched ndarray (or nested tuple of them) -> per-utterance
        list, trimmed to ``seq_length_output`` and optionally unsorted
        by ``permutation`` (ModularTrainer.py:132-186 semantics)."""
        if input_values is None:
            return None
        if isinstance(input_values, tuple):
            if all(v is None for v in input_values):
                return input_values
            parts = tuple(
                cls._split_return_values(x, seq_length_output,
                                         permutation, batch_first)
                for x in input_values)
            # Batch size comes from a split LIST part; None and
            # all-None tuples (returned verbatim) have no batch axis.
            batch_size = len([p for p in parts
                              if isinstance(p, list)][0])
            out = []
            for index in range(batch_size):
                entry = []
                for element in parts:
                    if element is None or (
                            isinstance(element, tuple)
                            and all(v is None for v in element)):
                        entry.append(element)
                    else:
                        entry.append(element[index])
                out.append(tuple(entry))
            return tuple(out)
        if not isinstance(input_values, np.ndarray):
            raise TypeError(
                "Expected numpy tensor but input is of type {}.".format(
                    type(input_values)))
        axis = 0 if batch_first else 1
        values = [np.squeeze(v, axis=axis) for v in np.split(
            input_values, input_values.shape[axis], axis=axis)]
        # Trim to per-utterance lengths.  Unlike the reference (whose
        # collate pads only to max-in-batch, so a singleton batch is
        # never padded) this repo's collate_batch pads to bucket
        # lengths — a batch of ONE still carries padding, so trim for
        # any batch size.
        if seq_length_output is not None \
                and np.ndim(seq_length_output) > 0 \
                and len(seq_length_output) >= 1:
            values = [v[:int(n)] for v, n in zip(values,
                                                 seq_length_output)]
        if permutation is not None:
            unsorted = list(values)
            for org_index, current_index in enumerate(permutation):
                unsorted[current_index] = values[org_index]
            values = unsorted
        return values

    def log_validation_set(self):
        if self.id_list_val:
            logger.info("Validation set (%d): %s", len(self.id_list_val),
                        self.id_list_to_str(sorted(self.id_list_val)))

    def log_test_set(self):
        if self.id_list_test:
            logger.info("Test set (%d): %s", len(self.id_list_test),
                        self.id_list_to_str(sorted(self.id_list_test)))

    def log_memory(self):
        from idiaptts_tpu.utils.misc import (get_device_memory_stats,
                                             get_memory_usage_mb)
        logger.info("CPU RSS: %.0f MB", get_memory_usage_mb())
        stats = get_device_memory_stats()
        if stats:
            logger.info("Device memory: %s", stats)

    def record_train_loss(self, loss_dict, epoch):
        self.train_losses.append((dict(loss_dict or {}), epoch))

    def record_validation_loss(self, loss_dict, epoch):
        self.validation_losses.append((dict(loss_dict or {}), epoch))

    def _get_loss_names(self):
        for store in (self.train_losses, self.validation_losses):
            if store:
                return list(store[0][0].keys())
        return None

    def get_losses(self, start_epoch=-1):
        """{loss_name: array} per split (:590-607 role)."""
        names = self._get_loss_names()
        if names is None:
            return None, None
        train = {n: np.array([d[n] for d, e in self.train_losses
                              if e >= start_epoch and n in d])
                 for n in names}
        val = {n: np.array([d[n] for d, e in self.validation_losses
                            if e >= start_epoch and n in d])
               for n in names}
        return train, val

    def log_losses(self, start_epoch=-1):
        losses = self.get_losses(start_epoch)
        if losses is None or losses[0] is None:
            return
        train, val = losses
        for name in train:
            logger.info("Loss %s validation progress: %s", name,
                        ", ".join("{:.4f}".format(v)
                                  for v in val.get(name, [])))
            logger.info("Loss %s train progress: %s", name,
                        ", ".join("{:.4f}".format(v)
                                  for v in train[name]))

    def reset_best_loss(self):
        self.best_loss = np.inf

    def get_model_path(self, hparams):
        return self._model_dir(hparams)   # out_dir/model_name/nn

    def save_checkpoint(self, hparams, epoch=None, best=False,
                        last=False):
        return self.model_handler.save_checkpoint(
            hparams.out_dir, hparams.model_name, epoch=epoch, best=best,
            last=last, best_loss=self.best_loss,
            networks_dir=hparams.get("networks_dir", "nn"))

    def load_checkpoint(self, hparams, epoch=None, step=None,
                        best=False, last=False):
        return self.model_handler.load_checkpoint(
            hparams.out_dir, hparams.model_name, epoch=epoch, step=step,
            best=best, last=last,
            networks_dir=hparams.get("networks_dir", "nn"))

    def load_best_model(self, hparams):
        best_loss, epoch, _ = self.load_checkpoint(hparams, best=True)
        if best_loss is not None:
            self.best_loss = best_loss
        return best_loss, epoch

    def get_dataset(self, split="train"):
        return {"train": self.dataset_train, "val": self.dataset_val,
                "test": self.dataset_test}[split]

    def get_labels(self, reader_name, id_name):
        return self.datareaders[reader_name].load(id_name)

    def gen_output(self, hparams, id_list,
                   post_processing_mapping=None):
        """Forward + save post-processed outputs to
        hparams.save_output_dir (:758-792 role); saved as npz with the
        output name as key."""
        mapping = post_processing_mapping \
            or getattr(self, "post_processing_mapping", {}) or {}
        results = self.forward(hparams, list(id_list))
        out_dir = hparams.get("save_output_dir") \
            or os.path.join(hparams.get("out_dir") or ".", "output")
        os.makedirs(out_dir, exist_ok=True)
        for id_name, sample in results.items():
            if isinstance(sample, np.ndarray):
                # Trainer-specific forward() may return bare arrays.
                key = next(iter(mapping), "output")
                np.savez(os.path.join(out_dir, id_name + ".npz"),
                         **{key: sample})
                continue
            arrays = {output_name: np.asarray(sample[output_name])
                      for output_name in (mapping or sample)
                      if output_name in sample}
            if arrays:
                np.savez(os.path.join(out_dir, id_name + ".npz"),
                         **arrays)
        return results

    @staticmethod
    def plot1d(data, path, title=""):
        """Quick 1-D curve figure (:940-975 role)."""
        from idiaptts_tpu.utils.plotter import DataPlotter
        with DataPlotter() as plotter:
            plotter.set_data_list(0, [(np.asarray(data).reshape(-1),
                                       title or "data")])
            plotter.gen_plot()
            plotter.save_to_file(path)
        return path

    @staticmethod
    def plot_specshow(spec, path, title=""):
        """Spectrogram image figure (:976-1006 role)."""
        from idiaptts_tpu.utils.plotter import DataPlotter
        with DataPlotter() as plotter:
            plotter.set_spec_data(0, np.asarray(spec),
                                  label=title or "spec")
            plotter.gen_plot()
            plotter.save_to_file(path)
        return path
def _inference_clone(reader):
    """Shallow copy of a reader prepared for inference datasets:
    match_length cleared (partners may be absent) and max_frames
    cleared (training crops must not truncate synthesis/benchmark
    inputs)."""
    import copy
    clone = copy.copy(reader)
    clone.match_length = None
    clone.max_frames = None
    return clone
