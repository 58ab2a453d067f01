"""Training CLI (parity: ``src/train.py``).

``python train.py -C configs/train/cfg_twophase_ufno.py [--group.key=v ...]``

Wires config -> dataset -> model -> criterion -> trainer, runs a pre-train
sanity evaluation on the validation set, initializes the optimizer after the
first forward pass (the reference's lazy-init flow — in JAX this is where
``model.init`` builds the param pytree), trains, pickles the summary, and
runs the final test evaluation.
"""

import os
import pickle
import sys
from argparse import Namespace
from datetime import datetime

from nps_tpu.configs.parse import parse_args
from nps_tpu.utils import misc as util
from nps_tpu.utils.misc import count_parameters

import nps_tpu.data as data
import nps_tpu.models as models
import nps_tpu.train as trainers
from nps_tpu.train.losses import build_criterion

PRINT_ARGS = True


def get_config_static(args, lazy_init=True, model_override=None):
    device = args["trainer"]["device"]

    dataset = getattr(data, args["dataset"].pop("object"))(**args["dataset"])

    model_name = args["model"]["object"]
    model = getattr(models, args["model"].pop("object"))(
        **args["model"], pde=dataset.pde)
    if model_override is not None:
        model = model_override

    criterion = build_criterion(**dict(args["criterion"]))
    args["criterion"].pop("object", None)

    config = Namespace(**args["trainer"])
    if args["experiment_name"] is None:
        now = datetime.now()
        timestring = (f"{now.date().month}{now.date().day}{now.time().hour}"
                      f"{now.time().minute}{now.time().microsecond}")
        args["experiment_name"] = f"{dataset.pde}_{model_name}_{timestring}"
    save_path = os.path.join(args["experiment_path"], args["experiment_name"])

    use_wandb = args["use_wandb"]
    wandb_kwargs = args["wandb_kwargs"]
    wandb_config_dict = {}
    if use_wandb:
        for k, v in args.items():
            wandb_config_dict[k] = dict(v) if isinstance(v, dict) else v

    epoch_callback = args["trainer"].pop("epoch_callback", None)

    trainer = getattr(trainers, args["trainer"].pop("object"))(
        model=model, data=dataset, config=config, criterion=criterion,
        optimizer=None, lr_scheduler=None, save_path=save_path,
        epoch_callback=epoch_callback, use_wandb=use_wandb,
        wandb_kwargs=wandb_kwargs, wandb_config_dict=wandb_config_dict)

    optimizer = None
    lr_scheduler = None
    if not lazy_init:
        optimizer = dict(args["optimizer"])
        lr_scheduler = dict(args["lr_scheduler"])
        trainer.set_optimizer(optimizer)
        trainer.set_lr_scheduler(lr_scheduler)
    return (device, dataset, model_name, model, criterion, trainer,
            optimizer, lr_scheduler)


def main(args):
    default_stdout = sys.stdout
    sys.stdout = util.Logger(default_stdout, write_log=False)

    # honor an explicit CPU request even when the environment pins an
    # accelerator platform (must happen before the jax backend initializes)
    if str(args.get("trainer", {}).get("device", "")).lower() == "cpu":
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass

    # multi-host bring-up (must precede any other jax use):
    #   --trainer.distributed=auto                  TPU-pod auto-detection
    #   --trainer.distributed=host:port,N,i         explicit coordinator
    dist = str(args.get("trainer", {}).get("distributed", "") or "")
    if dist and dist.lower() not in ("false", "0", "none"):
        from nps_tpu.parallel import init_distributed

        if dist.lower() in ("auto", "true", "1"):
            init_distributed()
        else:
            coord, n_proc, proc_id = dist.split(",")
            init_distributed(coordinator_address=coord,
                             num_processes=int(n_proc),
                             process_id=int(proc_id))
        import jax

        print(f"Distributed: process {jax.process_index()} of "
              f"{jax.process_count()}, {len(jax.devices())} global devices")

    if PRINT_ARGS:
        print(util.dict_str(args, prefix="--", mapping="="))

    experiment_path = args["experiment_path"]
    os.makedirs(experiment_path, exist_ok=True)

    device, dataset, model_name, model, criterion, trainer, _, _ = \
        get_config_static(args, lazy_init=True)

    print(f"Save path set to {trainer.config.save_path}")
    print(f"Loaded device: {trainer.device}")

    print("Sanity check on validation data...")
    _, valid_loader, test_loader = trainer.get_dataloaders()
    sample = next(iter(valid_loader))
    print("shape of one datapoint: (bs, channels, time, *spatial)",
          tuple(sample[1].shape))
    valid_loss, valid_summary = trainer.test(valid_loader)
    print("Pre-train valid summary:")
    print(util.dict_str(util.to_floatdict(valid_summary), prefix=" • "))

    if getattr(trainer.config, "eval_only", False):
        # evaluate a trained model without training:
        #   --trainer.eval_only=true --trainer.load_model=path/to.msgpack
        # (no load_model -> evaluates the freshly initialized model)
        load = getattr(trainer.config, "load_model", None)
        if load:
            trainer.load_model(load)
            print(f"Loaded model from {load}")
        summary = {}
        for name, tk in trainer.test_kwargs_list:
            for split, loader in (("valid", valid_loader),
                                  ("test", test_loader)):
                if callable(tk):
                    loss, stats = tk(loader, trainer)
                else:
                    loss, stats = trainer.test(loader, test_kwargs=tk)
                loss = util.to_float(loss)
                stats = util.to_floatdict(stats)
                print(f"[{name}/{split}] loss: {loss}")
                print(util.dict_str(stats, prefix=" • "))
                summary[f"{name}/{split}"] = dict(loss=loss, **stats)
        import jax

        if jax.process_index() == 0:  # writer guard (one file per fleet)
            with open(os.path.join(args["experiment_path"],
                                   args["experiment_name"]
                                   + "_eval_summary.pickle"), "wb") as f:
                pickle.dump(summary, f)
        print("Eval Completed!")
        return

    # optimizer / lr_scheduler after the first forward pass (lazy init)
    trainer.set_optimizer(dict(args["optimizer"]))
    trainer.set_lr_scheduler(dict(args["lr_scheduler"]))

    if args["function_pre"] is not None:
        print("\n\nRunning pre-training callable")
        args["function_pre"](args, dataset, None, None, model, criterion,
                             trainer)

    print("\n\n----Start training----")
    print("Number of parameters:", count_parameters(trainer.params))

    train_losses, val_losses, val_stats = trainer.train()
    if getattr(trainer, "preempted", False):
        # SIGTERM/SIGINT arrived: a full checkpoint was saved; exit with
        # the conventional 128+SIGTERM code so orchestrators reschedule
        # the job (which resumes via --trainer.resume=true)
        print("Run preempted — resume with --trainer.resume=true")
        sys.exit(143)
    print("Train losses:", util.to_floatlist(train_losses))
    first = list(val_losses.keys())[0]
    print("Validation losses:", util.to_floatlist(val_losses[first]))

    import jax

    if jax.process_index() == 0:  # writer guard (one file per fleet)
        with open(os.path.join(args["experiment_path"],
                               args["experiment_name"]
                               + "_train_summary.pickle"), "wb") as f:
            pickle.dump(dict(train_losses=train_losses,
                             val_losses=val_losses, val_stats=val_stats), f)

    test_loss, test_summary = trainer.test(test_loader)
    print("Test loss:", util.to_float(test_loss))
    print("Test summary:")
    print(util.dict_str(util.to_floatdict(test_summary), prefix=" • "))

    if args["function_post"] is not None:
        print("\n\nRunning post-training callable")
        args["function_post"](args, dataset, None, None, model, criterion,
                              trainer)

    print("Run Completed!")


def cli():
    """Parse args and run, with the reference's crash-safe envelope
    (``src/train.py:175-187``) made load-bearing: the reference's tmpdir is
    created and never used, while here MemMapDataset roots its preprocess
    scratch memmaps in it (via NPS_TPU_SCRATCH_DIR, unless the config sets
    an explicit preprocess_path) — so scratch is removed when the envelope
    exits on any exception, and the OS tmp reaper covers even a hard kill.
    The exception is held until cleanup has run, then re-raised."""
    import tempfile

    args = parse_args()
    exception = None
    with tempfile.TemporaryDirectory(prefix="nps_tpu_") as scratch:
        prev = os.environ.get("NPS_TPU_SCRATCH_DIR")
        os.environ["NPS_TPU_SCRATCH_DIR"] = scratch
        try:
            main(args)
        except (Exception, KeyboardInterrupt) as e:
            exception = e
        finally:
            if prev is None:
                os.environ.pop("NPS_TPU_SCRATCH_DIR", None)
            else:
                os.environ["NPS_TPU_SCRATCH_DIR"] = prev
    if exception is None:
        print("Run finished!")
    else:
        raise exception


if __name__ == "__main__":
    cli()
