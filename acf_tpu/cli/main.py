"""Unified CLI — one entry point covering the reference's three drivers.

Flag set is the union of run.py:25-75, run_adv.py:15-54 and
run_adv_ori.py:17-64; model names match the reference registry
(run.py:124-201, run_adv_ori.py:100-215):

  mf bpr apr amf amf2 abpr neumf aneumf sasrec asasrec asasrec2 gru4rec
  caser dream drcf dsin irgan apl pop mrv mfv av

Two-phase adversarial staging (apr/asasrec/asasrec2) follows
run_adv.py:97-120: clean training until --adv_epoch, then the adversarial
objective continues from the same parameters.

Usage:
    python -m acf_tpu.cli.main --model apr --data video --path data/ \
        --epochs 200 --adv_epoch 100 --d 64
"""

from __future__ import annotations

import argparse
from datetime import datetime

import jax
import optax

from acf_tpu.data import load_dataset
from acf_tpu.train import TrainConfig, Trainer
from acf_tpu.train.trainer import fit_two_phase
from acf_tpu.utils.io import OutputWriter


def build_parser():
    p = argparse.ArgumentParser(description="TPU-native adversarial CF")
    p.add_argument("--path", type=str, default="", help="data directory root")
    p.add_argument("--opath", type=str, default="out/", help="output dir")
    p.add_argument("--model", type=str, default="bpr")
    p.add_argument("--data", "--dataset", dest="data", type=str,
                   default="video")
    p.add_argument("--d", "--embed_size", dest="d", type=int, default=64)
    p.add_argument("--maxlen", type=int, default=50)
    p.add_argument("--train_dtype", default="float32",
                   choices=["bfloat16", "float32"],
                   help="SASRec train-path encoder compute dtype (eval is "
                        "always f32). bf16 is +9%% on the clean T=50 step; "
                        "quality-neutral within seed noise for ASASRec, "
                        "<=0.003 HR risk for clean SASRec over the 2 "
                        "seed-pairs measured (docs/PARITY.md)")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--adv_epoch", "--adv_epochs", dest="adv_epoch", type=int,
                   default=50,
                   help="epoch at which the adversarial phase starts")
    p.add_argument("--bs", "--batch_size", dest="bs", type=int, default=512)
    p.add_argument("--lr", type=float, default=None,
                   help="learning rate. Default: 0.05 for the adagrad "
                        "models (reference evaluation_adv.py:205-207); "
                        "DSIN defaults to its tuned adam 1e-4. An "
                        "explicit --lr always wins — including an "
                        "explicit 0.05 (None-default sentinel, round-5 "
                        "review finding)")
    p.add_argument("--reg", type=float, default=0.0)
    p.add_argument("--reg_adv", type=float, default=1.0)
    p.add_argument("--eps", type=float, default=0.5)
    p.add_argument("--eps_pos", type=float, default=0.0)
    p.add_argument("--eps_dense", type=float, default=0.0)
    p.add_argument("--eps_conv", type=float, default=0.0)
    p.add_argument("--eps_stage2", type=float, default=0.0,
                   help="staged-epsilon schedule for two-phase adversarial "
                        "models: enter the adversarial phase at --eps, "
                        "then raise eps to THIS value at --stage2_epoch. "
                        "Round-5 finding: fixed eps=0.8 lifts ASASRec to "
                        "~0.104 HR but bifurcates per seed; the staged "
                        "schedule (0.5 -> 0.8 at epoch 1100) reaches the "
                        "strong optimum reliably (docs/PARITY.md)")
    p.add_argument("--stage2_epoch", type=int, default=0,
                   help="epoch at which --eps_stage2 takes over "
                        "(required with --eps_stage2; must satisfy "
                        "adv_epoch < stage2_epoch < epochs)")
    p.add_argument("--adv", type=str, default="grad", choices=["grad", "random"])
    p.add_argument("--adv_steps", type=int, default=1,
                   help="PGD-style multi-step perturbation for apr (1 = the "
                        "reference's single FGSM step; MSAP arXiv:2010.01329)")
    p.add_argument("--fgsm", action="store_true",
                   help="wrap the chosen model in embedding-space FGSM/PGD "
                        "adversarial training (APR recipe generalized to the "
                        "whole zoo) with --adv_epoch two-phase staging")
    p.add_argument("--dns", type=int, default=1,
                   help="dynamic negative sampling: candidates per positive")
    p.add_argument("--loss", type=str, default="",
                   help="model loss variant: gru4rec bpr|top1|ce "
                        "(GRU4Rec.py:100-123), apl log|wgan|hinge (APL.py:62)")
    p.add_argument("--final_act", type=str, default="linear",
                   choices=["linear", "relu", "tanh"],
                   help="gru4rec output activation (GRU4Rec.py:92-98)")
    p.add_argument("--hidden_act", type=str, default="tanh",
                   choices=["tanh", "relu"],
                   help="gru4rec cell activation")
    p.add_argument("--sess_count", type=int, default=5,
                   help="dsin: number of sessions S")
    p.add_argument("--dsin_bi", action="store_true",
                   help="dsin: bidirectional (Bi-GRU) interest evolution "
                        "over session interests (paper-faithful; "
                        "sum-merged)")
    p.add_argument("--sess_len", type=int, default=0,
                   help="dsin: items per session (0 = maxlen // sess_count)")
    p.add_argument("--irgan_pair", action="store_true",
                   help="irgan: pairwise discriminator (DIS2, IRGAN.py:277-343)")
    p.add_argument("--sparse", action="store_true",
                   help="row-space sparse Adagrad step for bpr/apr "
                        "(identical trajectory, touched-rows-only updates)")
    p.add_argument("--dedup", type=str, default="auto",
                   choices=["auto", "matmul", "sort"],
                   help="duplicate-row aggregation program for --sparse "
                        "(auto: matmul below ~4k batch, sort above — the "
                        "matmul program's equality matrices are O(B²))")
    p.add_argument("--pre", type=str, default="",
                   help="npz checkpoint to warm-start matching params from")
    p.add_argument("--restore", type=str, default="",
                   help="full train-state snapshot (params+opt+RNG) to "
                        "resume from (reference --restore, run_adv.py:97-120)")
    p.add_argument("--restore_epoch", type=int, default=0,
                   help="first epoch to RUN after restoring (a snapshot "
                        "named '-e' was saved after epoch e completed, so "
                        "pass e+1 for bit-exact resume)")
    p.add_argument("--ckpt_dir", type=str, default="Pretrain",
                   help="directory for periodic --ckpt snapshots")
    p.add_argument("--w", type=float, default=0.001,
                   help="popularity-discriminator weight")
    p.add_argument("--pp", type=float, default=0.2, help="popularity percent")
    p.add_argument("--eval_mode", "--eval", dest="eval_mode", type=str,
                   default="all", choices=["all", "sample"])
    p.add_argument("--verbose", "--verbose_eval", dest="verbose", type=int,
                   default=1)
    p.add_argument("--save_model", type=int, default=0,
                   help="1 = save params on every new best NDCG (.best.npz) "
                        "and after every epoch (.last.npz) under h5/ "
                        "(reference run.py:257-272)")
    p.add_argument("--topk", type=int, default=10)
    p.add_argument("--ckpt", type=int, default=0)
    p.add_argument("--seed", type=int, default=2019)
    p.add_argument("--nrows", type=int, default=0,
                   help="truncate the dataset (smoke runs)")
    p.add_argument("--profile", type=str, default="",
                   help="directory for a JAX profiler trace of the run "
                        "(open with tensorboard/xprof or Perfetto; the "
                        "reference has no profiler — SURVEY.md §5)")
    p.add_argument("--mesh", type=str, default="",
                   help="train over a DATAxMODEL device mesh (e.g. 4x2: "
                        "batch sharded 4-way over \"data\", embedding tables "
                        "row-sharded 2-way over \"model\"; \"8\" = pure data "
                        "parallel). Falls back to virtual CPU devices when "
                        "fewer real devices exist (testing only). The "
                        "reference is strictly single-process — SURVEY.md "
                        "§2.2")
    return p


def _check_sparse_flags(args):
    """The row-space sparse step supports neither random-delta FGSM nor DNS;
    refuse loudly rather than silently training a different objective."""
    if args.adv != "grad":
        raise SystemExit("--sparse supports --adv grad only "
                         "(the sparse step has no random-delta branch); "
                         "drop --sparse or use --adv grad")
    if args.dns > 1:
        raise SystemExit("--sparse does not support --dns > 1 "
                         "(no DNS candidate selection in the sparse step); "
                         "drop --sparse or --dns")
    if args.adv_steps > 1:
        raise SystemExit("--sparse does not support --adv_steps > 1 "
                         "(single-step FGSM only in the sparse step); "
                         "drop --sparse or --adv_steps")


def make_model(name, data, args):
    """name → (model, optimizer, clean_model_for_phase1 | None)."""
    from acf_tpu.adversarial import PopularityAdversarial
    from acf_tpu.models import (
        APL, DRCF, DREAM, IRGAN, MFBPR, AlreadyVisit, Caser, GRU4Rec,
        MostFrequentlyVisit, MostPopular, MostRecentlyVisit, NeuMF,
        PointwiseMF, SASRec,
    )

    U, I, d = data.num_users, data.num_items, args.d
    adam = optax.adam(0.001)
    lr = 0.05 if args.lr is None else args.lr
    adagrad = optax.adagrad(lr, initial_accumulator_value=0.1)

    if name == "mf":
        return PointwiseMF(U, I, d), adam, None
    if name in ("bpr", "bpr-tf"):
        if args.sparse:
            from acf_tpu.ops.sparse_step import SparseMFBPR
            _check_sparse_flags(args)
            return SparseMFBPR(U, I, d, reg=args.reg, lr=lr,
                                dedup=args.dedup), adagrad, None
        return MFBPR(U, I, d, reg=args.reg, dns=args.dns), adagrad, None
    if name == "apr":
        if args.sparse:
            from acf_tpu.ops.sparse_step import SparseMFBPR
            _check_sparse_flags(args)
            clean = SparseMFBPR(U, I, d, reg=args.reg, lr=lr,
                                dedup=args.dedup)
            adv = SparseMFBPR(U, I, d, reg=args.reg, lr=lr,
                              dedup=args.dedup,
                              adversarial=True, eps=args.eps,
                              reg_adv=args.reg_adv)
            return adv, adagrad, clean
        clean = MFBPR(U, I, d, reg=args.reg, dns=args.dns)
        adv = MFBPR(U, I, d, reg=args.reg, adversarial=True, eps=args.eps,
                    reg_adv=args.reg_adv, adv_mode=args.adv, dns=args.dns,
                    adv_steps=args.adv_steps)
        return adv, adagrad, clean
    if name in ("amf", "amf2"):
        base = PointwiseMF(U, I, d)
        # amf2 = FastAdversarialMF: simultaneous two-player updates
        # (reference FastAdversarialMF.py:64-74)
        return PopularityAdversarial(U, I, d, base=base, weight=args.w,
                                     pop_percent=args.pp,
                                     simultaneous=(name == "amf2")), adam, None
    if name == "abpr":
        base = MFBPR(U, I, d)
        return PopularityAdversarial(U, I, d, base=base, weight=args.w,
                                     pop_percent=args.pp), adam, None
    if name == "neumf":
        return NeuMF(U, I, d), adam, None
    if name == "aneumf":
        base = NeuMF(U, I, d)
        return PopularityAdversarial(U, I, d, base=base, weight=args.w,
                                     pop_percent=args.pp), adam, None
    if name == "sasrec":
        return SASRec(U, I, d, maxlen=args.maxlen,
                      train_dtype=args.train_dtype), \
            optax.adam(0.001, b2=0.98), None
    if name in ("asasrec", "asasrec2"):
        clean = SASRec(U, I, d, maxlen=args.maxlen,
                       train_dtype=args.train_dtype)
        adv = SASRec(U, I, d, maxlen=args.maxlen, adversarial=True,
                     adv_mode=name, eps=args.eps, reg_adv=args.reg_adv,
                     eps_pos=args.eps_pos, eps_dense=args.eps_dense,
                     eps_conv=args.eps_conv, adv_steps=args.adv_steps,
                     train_dtype=args.train_dtype)
        return adv, optax.adam(0.001, b2=0.98), clean
    if name == "gru4rec":
        return GRU4Rec(U, I, d, maxlen=args.maxlen,
                       loss_type=args.loss or "bpr",
                       final_act=args.final_act,
                       hidden_act=args.hidden_act), adam, None
    if name in ("dream", "dream-tf"):
        return DREAM(U, I, d, maxlen=args.maxlen), adam, None
    if name == "drcf":
        return DRCF(U, I, d, maxlen=args.maxlen), adam, None
    if name == "caser":
        return Caser(U, I, d, maxlen=args.maxlen), adam, None
    if name == "dsin":
        from acf_tpu.models.dsin import DSIN
        # sessions sized so sess_count*sess_len ≈ --maxlen unless given
        ls = args.sess_len or max(args.maxlen // args.sess_count, 1)
        # tuned lr (round-4 sweep, models/dsin.py): 1e-3 memorizes in one
        # epoch on sparse implicit data, 1e-4 actually trains. An
        # explicitly-passed --lr overrides the tuned default (round-4
        # advisor finding: silently ignoring --lr broke sweeps; the
        # None-default sentinel makes an explicit 0.05 distinguishable).
        dsin_lr = 1e-4 if args.lr is None else args.lr
        return DSIN(U, I, d, sess_count=args.sess_count,
                    sess_len=ls, loss_type=args.loss or "bce",
                    bi_evolution=args.dsin_bi), \
            optax.adam(dsin_lr), None
    if name == "irgan":
        return IRGAN(U, I, d, pairwise_d=args.irgan_pair), optax.sgd(0.001), None
    if name == "apl":
        return APL(U, I, d, loss_function=args.loss or "log"), optax.sgd(0.05), None
    if name == "pop":
        return MostPopular(U, I, d, data=data), adam, None
    if name == "mrv":
        return MostRecentlyVisit(U, I, d, data=data), adam, None
    if name == "mfv":
        return MostFrequentlyVisit(U, I, d, data=data), adam, None
    if name == "av":
        return AlreadyVisit(U, I, d, data=data), adam, None
    raise ValueError(f"unknown model {name!r}")


def main(argv=None):
    args = build_parser().parse_args(argv)
    # the virtual-device fallback clears live JAX backends — build the mesh
    # before anything allocates device arrays
    mesh = None
    if args.mesh:
        from acf_tpu.parallel.mesh import mesh_from_spec
        mesh = mesh_from_spec(args.mesh)
    data = load_dataset(args.data, args.path or "data/",
                        eval_mode=args.eval_mode,
                        nrows=args.nrows or None)
    model, optimizer, clean = make_model(args.model, data, args)
    if args.fgsm:
        from acf_tpu.adversarial import FGSMAdversarial
        if clean is not None or args.model in (
                "amf", "amf2", "abpr", "aneumf", "irgan", "apl",
                "pop", "mrv", "mfv", "av"):
            raise SystemExit(f"--fgsm does not apply to {args.model!r} "
                             "(already adversarial, or no embedding tables)")
        if args.sparse:
            # the wrapper would inherit SparseMFBPR.init_opt_state (the
            # row-space Adagrad slot dict) while hiding its make_epoch_fn —
            # the generic optax epoch then runs against the wrong opt-state
            # tree; refuse loudly instead of silently dropping --sparse
            raise SystemExit("--fgsm does not combine with --sparse "
                             "(the row-space step has its own fused FGSM); "
                             "use --model apr --sparse for sparse APR")
        clean = model
        model = FGSMAdversarial(data.num_users, data.num_items, args.d,
                                base=clean, eps=args.eps,
                                reg_adv=args.reg_adv,
                                adv_steps=args.adv_steps)

    run_name = "%s_%s_d%d_%s" % (
        args.data, args.model, args.d,
        datetime.now().strftime("%Y_%m_%d_%H_%M_%S"))
    writer = OutputWriter(args.opath, run_name)
    writer.line(
        "Load data done. #user=%d, #item=%d, #train=%d, #test=%d"
        % (data.num_users, data.num_items, data.num_pairs,
           len(data.eval_users())))

    epochs = args.epochs
    if args.model in ("pop", "mrv", "mfv", "av"):
        epochs = 1  # naive baselines need one pass (run.py:275-276)
    if args.save_model:
        import os
        os.makedirs("h5", exist_ok=True)  # reference save dir (run.py:260)
    if mesh is not None:
        writer.line("Mesh: data=%d model=%d over %d %s device(s)"
                    % (mesh.shape["data"], mesh.shape["model"],
                       mesh.size, mesh.devices.flat[0].platform))
    cfg = TrainConfig(batch_size=args.bs, epochs=epochs,
                      mesh=mesh,
                      verbose=args.verbose, topk=args.topk,
                      eval_sampled=(args.eval_mode == "sample"),
                      ckpt_every=args.ckpt,
                      ckpt_path=(f"{args.ckpt_dir}/{args.data}/{args.model}"
                                 if args.ckpt else None),
                      save_model_path=(f"h5/{run_name}" if args.save_model
                                       else None),
                      seed=args.seed)

    restore = (args.restore, args.restore_epoch) if args.restore else None
    import contextlib
    profiler = contextlib.ExitStack()
    if args.profile:
        # ExitStack closes in the finally below, so the XPlane trace is
        # flushed even when training raises (OOM, Ctrl-C, bad flags)
        profiler.enter_context(jax.profiler.trace(args.profile))
    try:
        best = _run(args, data, model, clean, optimizer, cfg, writer, restore)
    finally:
        profiler.close()
    if args.profile:
        writer.line(f"Profiler trace written to {args.profile}")
    writer.line("End. Best Iteration %d: HR = %.4f, NDCG = %.4f"
                % (best.get("epoch", -1), best.get("hr", 0.0),
                   best.get("ndcg", 0.0)))
    return best


def _run(args, data, model, clean, optimizer, cfg, writer, restore):
    if args.eps_stage2 > 0.0 and clean is None:
        # same failure class as the --lr sentinel fix: a schedule flag
        # that silently does nothing mislabels a multi-hour run
        raise SystemExit(
            f"--eps_stage2 only applies to two-phase adversarial models "
            f"(apr/asasrec/asasrec2), not --model {args.model}")
    if clean is not None and args.eps_stage2 > 0.0:
        # staged-epsilon three-phase protocol (round 5):
        # clean 0..adv_epoch -> eps adv_epoch..stage2_epoch -> eps_stage2
        import dataclasses as _dc

        from acf_tpu.train.checkpoint import save_params

        if restore:
            raise SystemExit("--eps_stage2 does not support --restore")
        if not (args.adv_epoch < args.stage2_epoch < cfg.epochs):
            raise SystemExit(
                "--eps_stage2 requires --adv_epoch < --stage2_epoch < "
                f"--epochs (got {args.adv_epoch} / {args.stage2_epoch} / "
                f"{cfg.epochs})")
        adv_hi = _dc.replace(model, eps=args.eps_stage2)
        reset_opt = args.model not in ("asasrec", "asasrec2")
        tr = Trainer(clean, data, optimizer, cfg, writer)
        if args.pre:
            tr.load_pretrain(args.pre)
        tr.fit(epochs=args.adv_epoch, final=False)
        if cfg.ckpt_path:  # mirror fit_two_phase's phase-boundary saves
            save_params(cfg.ckpt_path + "-pretrain", tr.params)
        tr.switch_model(model, reset_opt=reset_opt)
        tr.fit(epochs=args.stage2_epoch, epoch_start=args.adv_epoch,
               final=False)
        tr.switch_model(adv_hi, reset_opt=False)
        best = tr.fit(epochs=cfg.epochs, epoch_start=args.stage2_epoch)
        if cfg.ckpt_path:
            save_params(cfg.ckpt_path + "-final", tr.params)
    elif clean is not None:
        # asasrec carries Adam slots into phase 2 (full-variable Saver,
        # utils.py:306-315); apr resets them (embeddings-only Saver,
        # evaluation_adv.py:235)
        reset_opt = args.model not in ("asasrec", "asasrec2")
        best = fit_two_phase(clean, model, data, optimizer, cfg,
                             adv_epoch=args.adv_epoch, writer=writer,
                             restore=restore, pretrain=args.pre or None,
                             reset_opt=reset_opt)
    else:
        trainer = Trainer(model, data, optimizer, cfg, writer)
        if args.pre:
            loaded = trainer.load_pretrain(args.pre)
            writer.line(f"Loaded pretrained leaves: {loaded}")
        if restore:
            trainer.restore_checkpoint(restore[0])
            best = trainer.fit(epoch_start=restore[1])
        else:
            best = trainer.fit()
    return best


if __name__ == "__main__":
    main()
