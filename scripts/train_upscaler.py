"""Train the learned 2x upscalers on self-supervised rendered frames.

Spatial mode (default): renders a few path-traced frames, optimizes the
residual CNN to reconstruct full-res frames from 2x downsamples
(models/upscaler.py).  Saves weights with orbax to checkpoints/upscaler
(FrameLoop picks them up via --upscaler-ckpt).

Temporal mode (--temporal): the DLSS-Ray-Reconstruction stand-in —
renders an orbit SEQUENCE with G-buffers, builds (current LR,
reprojected previous HR, target HR) triples with history-corruption
augmentation (so the blend net learns to reject invalid history), and
evaluates held-out PSNR of temporal vs spatial vs bilinear, running the
temporal model recurrently on its own predictions.

Usage: python scripts/train_upscaler.py [--steps 300] [--frames 4]
       python scripts/train_upscaler.py --temporal [--steps 600]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def render_training_frames(n_frames: int, size=(256, 256)):
    import bench
    from hrt_tpu.config import RenderConfig
    from hrt_tpu.frameloop import FrameLoop
    from hrt_tpu.models.camera import orbit_camera
    from hrt_tpu.models.scenefile import cornell_box

    frames = []
    for scene_obj, radius, height in (
        (bench.build_bench_scene(), 6.0, -1.5),
        (cornell_box(), 2.8, 0.0),
    ):
        cfg = RenderConfig(width=size[0], height=size[1], max_depth=3,
                           indirect=True, jitter=True, sky=True,
                           traversal="pallas")
        loop = FrameLoop(scene_obj, cfg, cull_threshold_px=0.0)
        for f in range(n_frames // 2):
            cam = orbit_camera(0.4 * f, radius=radius, height=height)
            frames.append(np.asarray(loop.step(cam)))
    return jnp.asarray(np.stack(frames))


def render_sequence(n_frames: int, size=(256, 256), scene_kind="bench",
                    phase=0.0, step=0.06, clean_spp: int = 8):
    """Orbit sequence mirroring the inference condition of the
    ray-reconstruction mode: NOISY 1-spp frames rendered at the LOW
    resolution (with their G-buffers + cameras) paired with CLEAN
    multi-spp targets rendered at the 2x output resolution."""
    import bench
    from hrt_tpu.config import RenderConfig
    from hrt_tpu.models.camera import orbit_camera
    from hrt_tpu.models.scenefile import cornell_box
    from hrt_tpu.ops import lbvh
    from hrt_tpu.renderer import camera_arrays, render_rows

    if scene_kind == "bench":
        scene_obj, radius, height = bench.build_bench_scene(), 6.0, -1.5
    else:
        scene_obj, radius, height = cornell_box(), 2.8, 0.0
    cfg_lr = RenderConfig(width=size[0] // 2, height=size[1] // 2,
                          max_depth=3, indirect=True, jitter=True,
                          sky=True, traversal="pallas")
    cfg_hr = RenderConfig(width=size[0], height=size[1], max_depth=3,
                          indirect=True, jitter=True, sky=True,
                          spp=clean_spp, traversal="pallas")
    scene = scene_obj.build()
    accel = lbvh.build_bvh_sah(scene, 32)

    @functools.partial(jax.jit, static_argnames=("config",))
    def render_gb(scene, accel, cams, frame, config):
        return render_rows(scene, accel, cams, frame, 0, config.height,
                           config, want_gbuffer=True)

    @functools.partial(jax.jit, static_argnames=("config",))
    def render_clean(scene, accel, cams, frame, config):
        return render_rows(scene, accel, cams, frame, 0, config.height,
                           config)

    lrs, wps, hits, cams_list, cleans = [], [], [], [], []
    for f in range(n_frames):
        cam = orbit_camera(phase + step * f, radius=radius,
                           height=height)
        cams = camera_arrays(cam, cfg_lr)
        img, gb = render_gb(scene, accel, cams, jnp.uint32(f), cfg_lr)
        lrs.append(np.asarray(img))
        wps.append(np.asarray(gb["world_pos"]))
        hits.append(np.asarray(gb["hit"]))
        cams_list.append(cams)
        cleans.append(np.asarray(render_clean(
            scene, accel, camera_arrays(cam, cfg_hr),
            jnp.uint32(1000 + f), cfg_hr)))
    return (jnp.asarray(np.stack(lrs)), jnp.asarray(np.stack(wps)),
            jnp.asarray(np.stack(hits)), cams_list,
            jnp.asarray(np.stack(cleans)))


def temporal_triples(lrs, wps, hits, cams_list, cleans):
    """(noisy lr_t, warped clean_{t-1}, clean_t) triples, t >= 1."""
    from hrt_tpu.models import upscaler

    lr, hist, hr = [], [], []
    for t in range(1, lrs.shape[0]):
        lr.append(lrs[t])
        hist.append(upscaler.reproject_history(
            cleans[t - 1], wps[t], hits[t], cams_list[t - 1],
            lrs.shape[2], lrs.shape[1]))
        hr.append(cleans[t])
    return jnp.stack(lr), jnp.stack(hist), jnp.stack(hr)


def _corrupt_history(hist, key):
    """Augmentation: invalid-history simulation (zeroed frames, coarse
    dropout blocks, value noise) so alpha learns rejection."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    b, h, w, _ = hist.shape
    # Per-sample full zero (the frame-0 / disocclusion-everywhere case).
    zero = jax.random.uniform(k1, (b, 1, 1, 1)) < 0.15
    # Coarse 16x16 dropout blocks.
    blocks = jax.random.uniform(k2, (b, h // 16, w // 16, 1)) < 0.1
    blocks = jax.image.resize(blocks.astype(jnp.float32),
                              (b, h, w, 1), method="nearest")
    # Mild multiplicative noise on the rgb (accumulated-error
    # simulation); dropout zeroes rgb AND the validity channel.
    noise = 1.0 + 0.05 * jax.random.normal(k3, (b, h, w, 1))
    rgb = hist[..., :3] * noise * (1.0 - blocks)
    valid = hist[..., 3:] * (1.0 - blocks)
    out = jnp.concatenate([rgb, valid], axis=-1)
    return jnp.where(zero, 0.0, out)


def crops(key, lr, hist, hr, crop=64, batch=8):
    f, h, w, _ = lr.shape
    kf, ky, kx, kc = jax.random.split(key, 4)
    fi = jax.random.randint(kf, (batch,), 0, f)
    ys = jax.random.randint(ky, (batch,), 0, h - crop + 1)
    xs = jax.random.randint(kx, (batch,), 0, w - crop + 1)

    def take(img_stack, scale):
        def one(args):
            i, y, x = args
            return jax.lax.dynamic_slice(
                img_stack[i], (y * scale, x * scale, 0),
                (crop * scale, crop * scale, img_stack.shape[-1]))
        return jax.vmap(one)((fi, ys, xs))

    return take(lr, 1), _corrupt_history(take(hist, 2), kc), take(hr, 2)


def psnr(a, b):
    tm = lambda x: np.clip(np.asarray(x), 0.0, 1.0)
    mse = np.mean((tm(a) - tm(b)) ** 2)
    return -10.0 * np.log10(max(mse, 1e-12))


def eval_temporal(net_t, params_t, net_s, params_s, lrs, wps, hits,
                  cams_list, cleans):
    """Held-out PSNR vs the CLEAN targets; temporal runs RECURRENTLY
    on its own previous output (the true inference condition)."""
    from hrt_tpu.models import upscaler

    h2, w2 = cleans.shape[1], cleans.shape[2]
    hist = jnp.zeros((h2, w2, 3), jnp.float32)
    p_t, p_s, p_b = [], [], []
    for t in range(lrs.shape[0]):
        lr = lrs[t]
        if t > 0:
            warped = upscaler.reproject_history(
                hist, wps[t], hits[t], cams_list[t - 1], w2 // 2,
                h2 // 2)
        else:
            warped = jnp.zeros(hist.shape[:-1] + (4,), jnp.float32)
        out_t = upscaler.upscale_temporal(net_t, params_t, lr, warped)
        hist = out_t
        out_s = upscaler.upscale(net_s, params_s, lr)
        out_b = jax.image.resize(lr, (h2, w2, 3), method="bilinear")
        if t > 0:  # skip the no-history first frame
            p_t.append(psnr(out_t, cleans[t]))
            p_s.append(psnr(out_s, cleans[t]))
            p_b.append(psnr(out_b, cleans[t]))
    return float(np.mean(p_t)), float(np.mean(p_s)), float(np.mean(p_b))




def recurrent_finetune(net, state, tx, seqs, steps, log_every=20):
    """Fine-tune on full sequences run RECURRENTLY: history is the
    model's own previous output warped by the real G-buffer motion —
    the exact inference condition of FrameLoop's temporal mode."""
    import functools
    from hrt_tpu.models import upscaler

    @functools.partial(jax.jit, static_argnames=("net", "tx"))
    def seq_step(state, net, tx, lrs, wps, hits, cam_stack, cleans):
        def loss_fn(params):
            h2, w2 = cleans.shape[1], cleans.shape[2]
            tm = lambda x: x / (1.0 + jnp.abs(x))
            hist = jnp.zeros((h2, w2, 3), jnp.float32)
            total = 0.0
            for t in range(lrs.shape[0]):
                if t == 0:
                    warped = jnp.zeros((h2, w2, 4), jnp.float32)
                else:
                    warped = upscaler.reproject_history(
                        hist, wps[t], hits[t],
                        jax.tree_util.tree_map(lambda a: a[t - 1],
                                               cam_stack),
                        w2 // 2, h2 // 2)
                pred = net.apply(params, lrs[t][None], warped[None])[0]
                diff = tm(pred) - tm(cleans[t])
                total = total + jnp.mean(jnp.sqrt(diff * diff + 1e-6))
                hist = pred
            return total / lrs.shape[0]

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params)
        params = optax.apply_updates(state.params, updates)
        return upscaler.TrainState(params, opt_state, state.step + 1), \
            loss

    import optax
    from hrt_tpu.models.upscaler import TrainState  # noqa: F401
    t0 = time.time()
    for step in range(steps):
        for (lrs, wps, hits, cams_list, cleans) in seqs:
            cam_stack = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *cams_list)
            state, loss = seq_step(state, net, tx, lrs, wps, hits,
                                   cam_stack, cleans)
        if step % log_every == 0 or step == steps - 1:
            print(f"recurrent step {step}: loss {float(loss):.5f} "
                  f"({time.time() - t0:.0f}s)")
    return state

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--temporal", action="store_true")
    ap.add_argument("--recurrent-steps", type=int, default=60)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from hrt_tpu.models import upscaler
    from hrt_tpu.utils.checkpoint import save_params

    if not args.temporal:
        out = args.out or "checkpoints/upscaler"
        print("rendering training frames...")
        frames = render_training_frames(args.frames)
        print("frames:", frames.shape)
        net, state, tx = upscaler.create(lr=2e-3)
        key = jax.random.PRNGKey(0)
        t0 = time.time()
        for step in range(args.steps):
            key, sub = jax.random.split(key)
            lr_b, hr_b = upscaler.self_supervised_batch(frames, sub,
                                                        crop=64, batch=8)
            state, loss = upscaler.train_step(state, net, tx, lr_b, hr_b)
            if step % 50 == 0 or step == args.steps - 1:
                print(f"step {step}: loss {float(loss):.5f} "
                      f"({time.time() - t0:.0f}s)")
        save_params(os.path.abspath(out), state.params)
        print("saved to", out)
        return

    out = args.out or "checkpoints/upscaler_temporal"
    n = max(args.frames, 16)
    print("rendering training sequences...")
    seqs = [render_sequence(n, scene_kind="bench"),
            render_sequence(n, scene_kind="cornell")]
    trip = [temporal_triples(*s) for s in seqs]
    lr = jnp.concatenate([t[0] for t in trip])
    hist = jnp.concatenate([t[1] for t in trip])
    hr = jnp.concatenate([t[2] for t in trip])
    print("triples:", lr.shape, hist.shape, hr.shape)

    net, state, tx = upscaler.create_temporal(lr=2e-3)
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    for step in range(args.steps):
        key, sub = jax.random.split(key)
        lr_b, hist_b, hr_b = crops(sub, lr, hist, hr)
        state, loss = upscaler.train_step_temporal(state, net, tx, lr_b,
                                                   hist_b, hr_b)
        if step % 50 == 0 or step == args.steps - 1:
            print(f"step {step}: loss {float(loss):.5f} "
                  f"({time.time() - t0:.0f}s)")
    if args.recurrent_steps:
        print("recurrent fine-tune (inference-condition unroll)...")
        state = recurrent_finetune(net, state, tx, seqs,
                                   args.recurrent_steps)
    save_params(os.path.abspath(out), state.params)
    print("saved to", out)

    # Held-out eval: a different orbit phase, recurrent inference.
    print("evaluating on held-out orbit...")
    ev = render_sequence(8, scene_kind="bench", phase=2.5)
    net_s, state_s, _ = upscaler.create()
    try:
        from hrt_tpu.utils.checkpoint import load_params
        params_s = load_params(
            os.path.abspath("checkpoints/upscaler"), state_s.params)
    except Exception:
        params_s = state_s.params
    pt, ps, pb = eval_temporal(net, state.params, net_s, params_s, *ev)
    print(f"PSNR held-out: temporal {pt:.2f} dB | spatial {ps:.2f} dB "
          f"| bilinear {pb:.2f} dB")


if __name__ == "__main__":
    main()
