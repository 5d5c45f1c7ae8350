#!/usr/bin/env python3
"""Train a latent flow-matching model (reference: train_flow.py).

Usage (reference CLI surface, README.md:91-120):
    ./train_flow.py --config-name flowers_sd.yaml [key=value ...]

The hot loop is one jitted XLA executable per step (fwd+bwd+OT+EMA+Adam, see
flocoder_tpu/training/flow.py); this script is the thin host driver: data
feeding, eval cadence, checkpoints, logging — the reference's linear-execution
ethos (StyleGuide.md §2), no trainer classes.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def train_flow(config):
    import jax
    import jax.numpy as jnp
    from flocoder_tpu.config import ldcfg
    from flocoder_tpu.data.datasets import PreEncodedDataset, Loader, create_image_loaders
    from flocoder_tpu.evaluation import evaluate_model
    from flocoder_tpu.inpainting import MaskEncoder
    from flocoder_tpu.models.codecs import setup_codec
    from flocoder_tpu.models.unet import Unet
    from flocoder_tpu.parallel.mesh import make_mesh, shard_batch, maybe_init_distributed
    from flocoder_tpu.training.checkpoint import (save_checkpoint,
                                                  load_checkpoint,
                                                  load_into_tree,
                                                  latest_checkpoint,
                                                  keep_recent_files)
    from flocoder_tpu.training.flow import (create_flow_state,
                                            make_flow_optimizer,
                                            make_flow_train_step,
                                            make_flow_eval_step, FlowState)
    from flocoder_tpu.training.schedules import cosine_warm_restarts_decay
    from flocoder_tpu.utils import logging as wblog
    from flocoder_tpu.utils.codebook_analysis import CodebookUsageTracker
    from flocoder_tpu.utils.rng import make_training_key

    maybe_init_distributed()
    # flow.n_model > 1 adds a model axis (used by ring/sequence-parallel
    # attention, flow.ring_attention=true)
    mesh = make_mesh(n_model=int(ldcfg(config, "n_model", 1)))
    print(f"train_flow: mesh = {mesh}, backend = {jax.default_backend()}")

    # ---- config -----------------------------------------------------------
    data_path = os.path.expanduser(config.data)
    # flow.reflow=true: rectified-flow distillation on a paired dataset
    # from tools/make_reflow_pairs.py (already latents — no codec suffix)
    reflow = bool(ldcfg(config, "reflow", False))
    # flow.meanflow=true: dual-time average-velocity training (MeanFlow,
    # reference README.md:158 research TODO) → 1-NFE serving via
    # generate_samples +method=meanflow. Fail fast: incompatible with
    # fixed-coupling reflow (MeanFlow re-draws (r,t) pairs per step).
    meanflow = bool(ldcfg(config, "meanflow", False))
    if meanflow and reflow:
        raise SystemExit("flow.meanflow=true does not combine with "
                         "inpainting datasets or flow.reflow")
    if "encoded" not in data_path and not reflow:
        data_path = f"{data_path}_encoded_{config.codec.choice}"
    batch_size = int(ldcfg(config, "batch_size", 256))
    # variable batch-size schedule (reference README.md:143 TODO
    # "Try variable size scheduler" — bs-scheduler StepBS/MultiStepBS
    # semantics; flocoder_tpu/training/schedules.py:batch_size_schedule).
    # Each distinct size is one extra XLA compile, cached after first use;
    # sizes stay multiples of the mesh's batch-shard count. The LR
    # schedule's step→epoch conversion keeps the BASE batch size's
    # steps_per_epoch (documented drift, matches "bigger batches = fewer
    # optimizer steps = effectively faster LR decay" of the torch package).
    bs_step_every = int(ldcfg(config, "bs_step_every", 0))
    bs_milestones = [int(m) for m in (ldcfg(config, "bs_milestones", None)
                                      or [])]
    # hoisted: also quantizes the bs schedule (the step_fn requires the
    # per-shard batch divisible by grad_accum — ADVICE r3)
    grad_accum = max(int(ldcfg(config, "grad_accum", 1)), 1)
    bs_sched = None
    if bs_step_every or bs_milestones:
        from flocoder_tpu.parallel.mesh import batch_shard_count
        from flocoder_tpu.training.schedules import batch_size_schedule
        bs_sched = batch_size_schedule(
            batch_size, gamma=float(ldcfg(config, "bs_gamma", 2.0)),
            step_every=bs_step_every, milestones=bs_milestones,
            max_bs=int(ldcfg(config, "bs_max", 0)) or None,
            multiple_of=batch_shard_count(mesh) * grad_accum)
        print(f"batch-size schedule: start {bs_sched(1)}, "
              f"gamma {ldcfg(config, 'bs_gamma', 2.0)}, "
              f"{'every ' + str(bs_step_every) + ' epochs' if bs_step_every else 'milestones ' + str(bs_milestones)}")
    n_classes = int(ldcfg(config, "n_classes", 0))
    learning_rate = float(ldcfg(config, "learning_rate", 1e-4))
    epochs = int(ldcfg(config, "epochs", 100))
    no_wandb = bool(ldcfg(config, "no_wandb", False))
    dim_mults = tuple(ldcfg(config, "dim_mults", [1, 2, 4, 8]))
    n_steps_eval = int(ldcfg(config, "n_steps", 100))
    cfg_strength = float(ldcfg(config, "cfg_strength", 3.0))
    is_midi = any(s in data_path.lower() for s in ("pop909", "midi"))
    keep_gray = int(ldcfg(config, "in_channels", 3)) == 1
    seed = int(ldcfg(config, "seed", 0))

    pre_encoded = bool(ldcfg(config, "pre_encoded", True))
    image_size = int(ldcfg(config, "image_size", 128))
    num_workers = int(ldcfg(config, "num_workers", 4))

    # ---- codec (frozen: eval decode, and on-the-fly encode) ----------------
    codec = setup_codec(config)
    is_audio = getattr(codec, "is_audio", False)
    if is_audio and not pre_encoded:
        raise SystemExit("codec.choice=dac trains flows on PRE-ENCODED "
                         "latents (run preencode_data.py first)")
    rng = jax.random.PRNGKey(seed)
    rng, k_codec = jax.random.split(rng)
    if is_audio:
        crop_len = int(config.codec.get("crop_len", 32768))
        codec_params = codec.init(k_codec, jnp.zeros((1, crop_len, 1)))
    else:
        codec_params = codec.init(k_codec, jnp.zeros(
            (1, image_size, image_size, codec.in_channels)))
    codec_ckpt = ldcfg(config, "codec_checkpoint", None) or (
        config.codec.get("checkpoint") if "codec" in config else None)
    if is_audio and not (codec_ckpt and os.path.exists(str(codec_ckpt))):
        codec_ckpt = latest_checkpoint("checkpoints", "dac_")
    if codec_ckpt and os.path.exists(str(codec_ckpt)):
        ck = load_checkpoint(str(codec_ckpt))
        codec_params = load_into_tree(codec_params, _flat(ck), strict=False)
        print(f"loaded codec checkpoint {codec_ckpt}")
    encode_fn = None

    # ---- data -------------------------------------------------------------
    if pre_encoded:
        def make_ds(split):
            shard_path = os.path.join(data_path, split, "data.fcshard")
            if os.path.exists(shard_path):
                from flocoder_tpu.data.shard import ShardDataset
                ds = ShardDataset(shard_path, n_classes=n_classes)
                print(f"[{split}] packed shard ({'native' if ds.reader.is_native else 'numpy'} gather), {len(ds)} records")
                return ds
            return PreEncodedDataset(f"{data_path}/{split}",
                                     n_classes=n_classes)

        train_loader = Loader(make_ds("train"), batch_size, shuffle=True,
                              num_workers=num_workers, seed=seed)
        val_loader = Loader(make_ds("val"), batch_size, shuffle=True,
                            num_workers=num_workers, seed=seed + 1)
        batch0 = next(iter(train_loader))
        H, W, C = batch0["target"][0].shape
    else:
        # On-the-fly mode (reference: train_flow.py:253-262 pre_encoded=False):
        # image loaders feed pixels; the frozen codec's encode runs INSIDE
        # the jitted train step (encode_fn below).
        raw_path = os.path.expanduser(config.data)
        train_loader, val_loader = create_image_loaders(
            batch_size, image_size, raw_path, num_workers=num_workers,
            is_midi=is_midi, config=config, seed=seed)
        train_loader.key = val_loader.key = "pixels"
        batch0 = next(iter(train_loader))
        H, W, C = codec.latent_shape(image_size)
        encode_fn = lambda px: codec.encode(codec_params, px)
        print(f"on-the-fly mode: encoding {image_size}px images in-step")

    latent_shape = (H, W, C)
    inpainting = "mask_pixels" in batch0
    # reflow needs paired batches: fixed couplings, no OT re-pairing
    # (training/flow.py paired_source docs)
    if reflow and ("source" not in batch0 or inpainting):
        raise SystemExit("flow.reflow=true needs a paired dataset with "
                         "source_latents and no masks — generate one with "
                         "tools/make_reflow_pairs.py")
    print(f"latent shape HWC = {latent_shape}, inpainting = {inpainting}, "
          f"reflow = {reflow}, n_batches/epoch = {len(train_loader)}")

    output_dir = f"output_{os.path.basename(data_path)}-{H}x{W}"
    os.makedirs(output_dir, exist_ok=True)

    # ---- model ------------------------------------------------------------
    # bfloat16 compute (fp32 params/outputs) is the TPU-native precision;
    # enable with flow.bf16=true (off by default for CPU-dev parity)
    dtype = jnp.bfloat16 if bool(ldcfg(config, "bf16", False)) else jnp.float32
    # sequence-parallel bottleneck attention over the mesh 'model' axis
    # (flow.ring_attention + flow.n_model>1); params are identical with or
    # without the flag, so the eval/sampling paths use a ring-free twin
    n_model = int(dict(mesh.shape).get("model", 1))
    use_ring = bool(ldcfg(config, "ring_attention", False)) and n_model > 1
    # (meanflow parsed up top, before data loading, for fail-fast config
    # validation; here only the dataset-dependent inpainting clash remains)
    if meanflow and inpainting:
        raise SystemExit("flow.meanflow=true does not combine with "
                         "inpainting datasets or flow.reflow")
    # MeanFlow models keep time UNSCALED: the identity target
    # (t−r)·du/dr is O(1) only when the field is smooth in r, and the
    # reference's t·999 convention puts sin(999·ω·r) embeddings in the jvp
    # path — measured raw target MSE 2.8e4 (vs 4.8 unscaled) at init, which
    # never trains down. Serving reads the same flag from the checkpoint
    # config (generate_samples.load_models_once).
    t_scale = 1.0 if meanflow else 999.0
    # flow.arch=hdit swaps the velocity field for the Hourglass DiT family
    # (models/hdit.py) — the reference's non-pre-encoded branch names this
    # exact model but its module is absent from the package
    # (reference train_flow.py:292-300); here it is a real, servable
    # alternative on the SAME pre-encoded pipeline. Everything downstream
    # is model_apply-generic.
    arch = str(ldcfg(config, "arch", "unet")).lower()
    if arch == "hdit":
        if inpainting:
            raise SystemExit("flow.arch=hdit has no mask-conditioning path "
                             "(neither does the reference's HDiT branch); "
                             "use arch=unet for inpainting datasets")
        from flocoder_tpu.models.hdit import hdit_from_config
        model = hdit_from_config(config, channels=C, n_classes=n_classes,
                                 dtype=dtype, dual_time=meanflow)
        # MoE levels (flow.hdit_moe_experts) sow a load-balance aux loss the
        # train step must fold in; expert parallelism (flow.moe_ep) splits
        # each MoE level's experts over the 'model' axis inside the
        # shard_map step (parallel/moe.py:moe_geglu_replicated)
        moe_on = any(lv.moe_experts for lv in model.levels)
        if moe_on and meanflow:
            raise SystemExit("flow.hdit_moe_experts does not combine with "
                             "flow.meanflow (the MeanFlow identity jvp has "
                             "no aux-loss channel)")
        use_ep = (moe_on and bool(ldcfg(config, "moe_ep", False))
                  and n_model > 1)
        # pipeline parallelism (flow.pp): the stacked mid level
        # (flow.hdit_pp_stages, models/hdit.py 'mid_blocks') runs as a
        # GPipe pipeline over 'model' inside the shard_map step
        # (parallel/pipeline.py); serving replays it sequentially.
        use_pp = (model.pp_stages > 0 and bool(ldcfg(config, "pp", False))
                  and n_model > 1)
        if use_pp and (meanflow
                       or float(ldcfg(config, "curvature_weight", 0.0))):
            raise SystemExit("flow.pp does not combine with flow.meanflow "
                             "or flow.curvature_weight (their forward-mode "
                             "jvp cannot ride the pipeline's custom_vjp)")
        if use_pp and n_model != model.pp_stages:
            raise SystemExit(f"flow.pp needs flow.n_model "
                             f"({n_model}) == flow.hdit_pp_stages "
                             f"({model.pp_stages})")
        if use_pp and use_ring:
            raise SystemExit("flow.pp and flow.ring_attention both claim "
                             "the mesh 'model' axis; pick one")
        clone_kw = {}
        if use_ring:
            clone_kw.update(ring_axis="model", ring_axis_size=n_model)
        if use_ep:
            clone_kw.update(ep_axis="model", ep_axis_size=n_model)
            print(f"MoE expert parallelism over 'model' axis "
                  f"(size {n_model})")
        if use_pp:
            clone_kw.update(pp_axis="model", pp_axis_size=n_model)
            print(f"pipeline parallelism: mid level as {n_model} stages "
                  f"over 'model'")
        train_model = model.clone(**clone_kw) if clone_kw else model
    else:
        moe_on = False
        model_kwargs = dict(dim=H, channels=C, dim_mults=dim_mults,
                            n_classes=n_classes, mask_cond=inpainting,
                            mask_channels=C, dtype=dtype,
                            dual_time=meanflow)
        model = Unet(**model_kwargs)  # eval/init/sampling twin (no ring)
        train_model = (Unet(ring_axis="model", ring_axis_size=n_model,
                            **model_kwargs) if use_ring else model)
    if use_ring:
        print(f"ring attention over 'model' axis (size {n_model})")
    rng, k_model = jax.random.split(rng)
    cond0 = {"class_cond": jnp.zeros((2,), jnp.int32),
             "mask_cond": (jnp.zeros((2, H, W, C)) if inpainting else None)}
    v0 = model.init(k_model, jnp.zeros((2, H, W, C)), jnp.zeros((2,)), cond0)
    # keep only the 'params' collection: init also materializes sown
    # aux-loss collections (MoE), which must not enter state/optimizer
    params = {"model": {"params": v0["params"]}}
    mask_encoder = None
    mask_encoder_apply = None
    if inpainting:
        mask_encoder = MaskEncoder(output_channels=C, target_hw=(H, W))
        rng, k_me = jax.random.split(rng)
        params["mask_encoder"] = mask_encoder.init(
            k_me, jnp.asarray(batch0["mask_pixels"][:2]))
        mask_encoder_apply = lambda p, m: mask_encoder.apply(p, m)
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    print(f"model params: {n_params/1e6:.2f}M")

    # ---- optimizer / state ------------------------------------------------
    sched = cosine_warm_restarts_decay(
        learning_rate, T_0=int(ldcfg(config, "lr_T0", 50)),
        T_mult=int(ldcfg(config, "lr_Tmult", 2)),
        decay=float(ldcfg(config, "lr_decay", 0.6)),
        steps_per_epoch=max(len(train_loader), 1))
    tx = make_flow_optimizer(sched, mask_encoder=inpainting)
    state = create_flow_state(params, tx)

    # resume (the reference has NO flow resume path, SURVEY.md §5.4 — fresh
    # starts only; here load_checkpoint=<flow_*.npz> restores params,
    # optimizer state, and EMA)
    start_epoch = 1
    resume = ldcfg(config, "load_checkpoint", None)
    if resume and os.path.exists(str(resume)):
        ck = load_checkpoint(str(resume))
        from flocoder_tpu.training.checkpoint import flatten_tree as _ft
        new_params = load_into_tree(state.params,
                                    _ft(ck["model_state_dict"]), strict=False)
        new_opt = state.opt_state
        if ck.get("optimizer_state_dict"):
            try:
                new_opt = load_into_tree(state.opt_state,
                                         _ft(ck["optimizer_state_dict"]),
                                         strict=True)
            except (KeyError, ValueError) as e:
                print(f"optimizer state not restored ({e}); fresh optimizer")
        new_ema = state.ema
        if ck.get("ema_state_dict"):
            new_ema = load_into_tree(state.ema, _ft(ck["ema_state_dict"]),
                                     strict=False)
        state = FlowState(params=new_params, opt_state=new_opt, ema=new_ema,
                          step=jnp.asarray(ck["epoch"] * len(train_loader),
                                           jnp.int32))
        start_epoch = ck["epoch"] + 1
        print(f"resumed from {resume} at epoch {ck['epoch']}")

    model_apply = lambda p, x, t, c: model.apply(p, x, t, c)
    if moe_on:
        # MoE training contract: apply with the 'moe_losses' collection
        # mutable and return (v, aux_loss) — the step adds aux_loss to the
        # objective (training/flow.py 'model_aux'). Serving/eval use plain
        # apply, where the sown losses are silently dropped.
        moe_aux_w = float(ldcfg(config, "hdit_moe_aux_weight", 1e-2))

        def train_model_apply(p, x, t, c):
            v, mut = train_model.apply(p, x, t, c,
                                       mutable=["moe_losses"])
            leaves = jax.tree_util.tree_leaves(mut)
            aux = moe_aux_w * (sum(leaves) / len(leaves))
            return v, aux
    else:
        train_model_apply = (
            model_apply if train_model is model else
            (lambda p, x, t, c: train_model.apply(p, x, t, c)))
    # steps_per_dispatch > 1: scan K optimizer steps inside ONE jitted call
    # (amortizes host dispatch overhead — docs/BENCH_NOTES.md tpu_demo notes)
    steps_per_call = max(int(ldcfg(config, "steps_per_dispatch", 1)), 1)
    # multi-chip: the explicit shard_map path (batch sharded over the data
    # axes, per-shard OT pairing, pmean'd grads — training/flow.py). With
    # flow.fsdp=true the state is FSDP-sharded instead and plain jit lets
    # GSPMD insert the all-gathers/reduce-scatters (parallel/mesh.py).
    use_fsdp = bool(ldcfg(config, "fsdp", False)) and mesh.size > 1
    step_mesh = mesh if (mesh.size > 1 and not use_fsdp) else None
    if step_mesh is not None:
        print(f"multi-chip flow training: shard_map over {mesh.shape}")
    # inpainting curriculum / on-the-fly mask augmentation (reference:
    # train_flow.py:126-160, :275-279 — disabled in the reference's live
    # config; enable with flow.otf_aug=true + schedule keys). blank_latents
    # = the encoded blank image that "unconditional" samples start from.
    blank_latents = None
    otf_aug = None
    if inpainting and bool(ldcfg(config, "otf_aug", False)):
        blank_latents = jnp.asarray(codec.encode(
            codec_params, jnp.zeros((1, image_size, image_size,
                                     codec.in_channels))))
        print(f"blank_latents range [{float(blank_latents.min()):.3f}, "
              f"{float(blank_latents.max()):.3f}]")
        otf_aug = {
            "curriculum_epochs": int(ldcfg(config, "curriculum_epochs", 0)),
            "extend_epochs": int(ldcfg(config, "extend_epochs", 0)),
            "p_ones": float(ldcfg(config, "p_ones", 0.0)),
            "p_zeros": float(ldcfg(config, "p_zeros", 0.0)),
            "steps_per_epoch": max(len(train_loader), 1)}
    step_kwargs = dict(
        mask_encoder_apply=mask_encoder_apply,
        ema_decay=float(ldcfg(config, "ema_decay", 0.999)),
        encode_fn=encode_fn,
        donate=ldcfg(config, "donate", None),
        ot_method=str(ldcfg(config, "ot_method", "parallel")),
        ot_block=(int(ldcfg(config, "ot_block", 0)) or None),
        blank_latents=blank_latents, otf_aug=otf_aug,
        paired_source=reflow,
        # flow.curvature_weight > 0 adds the path-straightness penalty
        # (reference README.md:147 TODO; training/flow.py docstring)
        curvature_weight=float(ldcfg(config, "curvature_weight", 0.0)),
        meanflow=meanflow,
        meanflow_ratio=float(ldcfg(config, "meanflow_ratio", 0.25)),
        meanflow_adaptive_p=float(ldcfg(config, "meanflow_adaptive_p", 0.5)),
        t_scale=t_scale,
        # flow.grad_accum=G: microbatch gradient accumulation — effective
        # batch G× beyond activation HBM (training/flow.py docstring)
        grad_accum=grad_accum,
        mesh=step_mesh)
    train_step = make_flow_train_step(train_model_apply, tx,
                                      steps_per_call=steps_per_call,
                                      **step_kwargs)
    # single-step variant for the trailing partial dispatch window (a scan
    # over K steps cannot take fewer batches without retracing)
    train_step_single = (train_step if steps_per_call == 1 else
                         make_flow_train_step(train_model_apply, tx,
                                              steps_per_call=1,
                                              **step_kwargs))
    if use_fsdp:
        from flocoder_tpu.parallel.mesh import shard_state
        state = shard_state(mesh, state)
        print(f"FSDP parameter sharding over {mesh.shape}")
    eval_step = make_flow_eval_step(model_apply,
                                    mask_encoder_apply=mask_encoder_apply,
                                    paired_source=reflow, t_scale=t_scale)

    use_wandb = not no_wandb
    if use_wandb:
        wblog.init(project=str(ldcfg(config, "project_name", "flocoder-flow")),
                   name=ldcfg(config, "run_name", None),
                   config=dict(config))

    cb_tracker = CodebookUsageTracker(
        num_levels=int(ldcfg(config, "codebook_levels", 4)),
        codebook_size=int(ldcfg(config, "vq_num_embeddings", 32)))
    codec_quantize = None
    if hasattr(codec, "quantize"):
        codec_quantize = jax.jit(lambda z: codec.quantize(codec_params, z))

    # ---- training loop ----------------------------------------------------
    key = make_training_key(seed + 1, ldcfg(config, "rng_impl", None))
    t_start = time.time()
    def iter_dispatches(loader):
        """Yield (batch_for_dispatch, n_steps_it_contains)."""
        def strip(b):
            # PairDataset batches alias 'source' == target pixels; outside
            # inpainting/reflow the step never reads it — drop before
            # device_put
            if not (inpainting or reflow):
                b.pop("source", None)
            return b
        if steps_per_call == 1:
            for b in loader:
                yield strip(b), 1
            return
        chunk = []
        for b in loader:
            chunk.append(strip(b))
            if len(chunk) == steps_per_call:
                yield ({k: np.stack([c[k] for c in chunk])
                        for k in chunk[0]}, steps_per_call)
                chunk = []
        # trailing partial window: run the leftover batches through the
        # single-step variant (a shorter scan would retrace) so every epoch
        # — including ones with < steps_per_dispatch batches — still steps
        for b in chunk:
            yield b, 1

    for epoch in range(start_epoch, epochs + 1):
        if bs_sched is not None:
            new_bs = bs_sched(epoch)
            if new_bs != train_loader.batch_size:
                print(f"  batch size {train_loader.batch_size} → {new_bs} "
                      f"(bs schedule)")
                train_loader.batch_size = new_bs
        cur_bs = train_loader.batch_size
        ep_losses = []
        n_steps_done = 0
        t_ep = time.time()
        for batch, n_in in iter_dispatches(train_loader):
            key, k = jax.random.split(key)
            fn = train_step if n_in == steps_per_call else train_step_single
            state, aux = fn(
                state, shard_batch(mesh, batch, axis=0 if n_in == 1 else 1), k)
            ep_losses.append(aux.get("loss_mean", aux["loss"]))
            n_steps_done += n_in
        # one device sync per epoch, not per step
        ep_losses = [float(x) for x in ep_losses]
        steps_per_sec = n_steps_done / max(time.time() - t_ep, 1e-9)
        mean_loss = float(np.mean(ep_losses)) if ep_losses else float("nan")
        lr_now = float(sched(int(state.step)))
        print(f"epoch {epoch}/{epochs}  loss {mean_loss:.4f}  "
              f"lr {lr_now:.2e}  {steps_per_sec:.2f} it/s  "
              f"({steps_per_sec * cur_bs:.0f} samples/s)")
        if use_wandb:
            wblog.log({"Loss/train": mean_loss, "Learning Rate": lr_now,
                       "epoch": epoch, "batch_size": cur_bs,
                       "samples_per_sec": steps_per_sec * cur_bs})

        # ---- eval cadence (reference: train_flow.py:400); flow.no_eval=true
        # skips sampling evals entirely (dryrun / pure-throughput runs) -----
        if not bool(ldcfg(config, "no_eval", False)) and (
                (epoch < 20) or (epoch % 10 == 0)):
            vb = next(iter(val_loader))
            if not (inpainting or reflow):
                vb.pop("source", None)
            if encode_fn is not None and "pixels" in vb:
                vb = dict(vb)
                vb["target"] = np.asarray(encode_fn(jnp.asarray(vb["pixels"])))
            key, k1, k2, k3 = jax.random.split(key, 4)
            val_loss = float(eval_step(state.params, shard_batch(mesh, vb), k1))
            print(f"  val loss {val_loss:.4f}")
            if use_wandb:
                wblog.log({"Loss/val": val_loss, "epoch": epoch})

            # inpainting eval conditions on the val batch's real masks
            # (reference: train_flow.py:404-427 builds eval cond from the
            # same batch_to_data outputs)
            eval_mask_cond = None
            eval_source = None
            if inpainting and "mask_pixels" in vb:
                eval_mask_cond = mask_encoder.apply(
                    state.params["mask_encoder"],
                    jnp.asarray(vb["mask_pixels"]))
                k_blend = jax.random.fold_in(k1, 1)
                noise = jax.random.normal(k_blend,
                                          jnp.asarray(vb["source"]).shape)
                eval_source = (jnp.asarray(vb["source"]) + eval_mask_cond *
                               (noise - jnp.asarray(vb["source"])))
            eval_kwargs = dict(
                codec=codec, codec_params=codec_params, epoch=epoch,
                target_latents=jnp.asarray(vb["target"]),
                cond={"class_cond": jnp.asarray(vb["class_cond"]),
                      "mask_cond": eval_mask_cond},
                source=eval_source,
                mask_pixels=(jnp.asarray(vb["mask_pixels"])
                             if inpainting and "mask_pixels" in vb else None),
                batch_size=min(batch_size, 256), n_classes=n_classes,
                # eval_method: rk4 (reference default) | heun | midpoint |
                # ab4 | euler — ab4 cuts eval NFE ~3x at matching accuracy
                method=str(ldcfg(config, "eval_method",
                                 "meanflow" if meanflow else "rk4")),
                n_steps=n_steps_eval, t_scale=t_scale,
                cfg_strength=cfg_strength, is_midi=is_midi,
                keep_gray=keep_gray, cb_tracker=cb_tracker,
                codec_quantize=codec_quantize, use_wandb=use_wandb,
                output_dir=output_dir,
                # training-time evals ride the same mesh as the train step
                # (degenerate meshes are treated as single-device)
                mesh=mesh)
            # params= routes through the cached fused generate+decode
            # executable (evaluation._get_fused_sampler) — model_apply is
            # the stable callable built above, so raw and EMA evals share
            # one compile. Audio (DAC) flows eval through the waveform twin
            # (latent metrics + mel Sinkhorn + WAV dumps).
            eval_fn = evaluate_model
            if is_audio:
                from flocoder_tpu.evaluation import evaluate_model_audio
                eval_fn = evaluate_model_audio
            metrics = eval_fn(
                model_apply, params=state.params["model"],
                rng=k2, tag="", **eval_kwargs)
            print("  metrics: " +
                  (f"sinkhorn_mel {metrics['sinkhorn_mel']:.4f}  "
                   if is_audio else
                   f"FID_px {metrics['FID_px']:.2f}  ") +
                  f"sinkhorn {metrics['sinkhorn']:.4f}")
            if epoch > 5 and epoch % 2 == 0:  # EMA eval (train_flow.py:431)
                eval_fn(
                    model_apply, params=state.ema["model"],
                    rng=k3, tag="ema_", **eval_kwargs)
            if epoch % 2 == 0:
                cb_tracker.reset_all()

        # ---- checkpoints (reference: train_flow.py:441-447) ---------------
        if epoch % int(ldcfg(config, "ckpt_every", 25)) == 0:
            if bool(ldcfg(config, "orbax_checkpoints", False)):
                # orbax interop backend (training/checkpoint.py): for
                # environments whose TPU tooling consumes orbax trees
                from flocoder_tpu.training.checkpoint import \
                    save_checkpoint_orbax
                save_checkpoint_orbax(
                    {"params": state.params, "opt_state": state.opt_state,
                     "ema": state.ema}, epoch=epoch,
                    ckpt_dir="checkpoints_orbax", config=config, keep=5)
            elif bool(ldcfg(config, "sharded_checkpoints", False)):
                # multi-host scale path: each host writes its own shards
                # (training/checkpoint.py:save_checkpoint_sharded);
                # restorable onto any mesh shape
                from flocoder_tpu.training.checkpoint import \
                    save_checkpoint_sharded
                save_checkpoint_sharded(
                    {"params": state.params, "opt_state": state.opt_state,
                     "ema": state.ema}, epoch=epoch, ckpt_dir="checkpoints",
                    prefix="flow_", config=config, keep=5)
            else:
                save_checkpoint(state.params, epoch=epoch,
                                ckpt_dir="checkpoints",
                                prefix="flow_", opt_state=state.opt_state,
                                ema=state.ema, config=config, keep=5)
                save_checkpoint(state.ema, epoch=epoch,
                                ckpt_dir="checkpoints",
                                prefix="flowema_", config=config, keep=5)
            keep_recent_files(100, directory=output_dir, pattern="*.png")

    print(f"done in {time.time()-t_start:.0f}s")
    if use_wandb:
        wblog.finish()
    return state


def _flat(ck: dict) -> dict:
    from flocoder_tpu.training.checkpoint import flatten_tree
    return flatten_tree(ck["model_state_dict"])


def main():
    from flocoder_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from flocoder_tpu.config import parse_cli
    config = parse_cli(default_config=None,
                       config_dir=os.path.join(os.path.dirname(
                           os.path.abspath(__file__)), "configs"))
    print("Config:", dict(config))
    train_flow(config)


if __name__ == "__main__":
    main()
