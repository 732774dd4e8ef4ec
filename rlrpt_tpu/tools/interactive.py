"""Interactive SDL render window with keyboard camera control.

TPU-native equivalent of the reference's presentation layer: the SDL
window + per-frame render loop of main.cu:42-89 (`Update()` polls the
keyboard and moves/rotates the camera; main.cu:207-243 re-renders and
presents each frame) and sdl_screen.cpp (window/texture/PutPixelSDL/
SDL_SaveImage).  Uses pygame (SDL2) for presentation only — every pixel
is produced by the jitted renderers; the window just blits the frame.

Keys (matching Camera::Update, main.cu:61-88):
  UP / W      move forwards          DOWN / S    move backwards
  LEFT / A    rotate left            RIGHT / D   rotate right
  Q / E       rotate up / down
  F           save frame (BMP, like SDL_SaveImage -> screenshot.bmp)
  ESC         quit

Modes: default (megakernel fast path) and sarsa (accumulating online
learning across frames like the reference's mode-1 loop, main.cu:301-362;
moving the camera keeps the learned radiance map — the Q-table is
camera-independent).

Headless operation (no display server): pass --frames N to render N
frames with a scripted camera move under SDL's dummy video driver and
save the last frame — this is what the test suite drives.

Usage:
  python -m rlrpt_tpu.tools.interactive [--scene cornell] [--mode default]
      [--size 360] [--spp 4] [--bounces 20] [--frames 0] [--out out.bmp]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def _build_renderer(mode, scene, cfg, rl, interpret):
    """Returns render(key, camera) -> (img [0,1], aux), carrying learning
    state internally for sarsa (like the reference's persistent device
    radiance map, main.cu:274-301)."""
    import jax

    if mode == "default":
        from rlrpt_tpu.ops.megakernel import render_default_mega

        def render(key, camera):
            return render_default_mega(key, scene, camera, cfg,
                                       r_tile=1024, pix_mux=4,
                                       interpret=interpret)
        return render

    if mode == "sarsa":
        from rlrpt_tpu.integrators.sarsa_wavefront import (
            render_frame_sarsa_wavefront)
        from rlrpt_tpu.radiance.grid_bucket import build_volume_class_table
        from rlrpt_tpu.radiance.volumes import build_radiance_volumes

        vols = build_radiance_volumes(scene, rl)
        grid = build_volume_class_table(vols, scene)
        state = {"vols": vols}

        def render(key, camera):
            img, vols, aux = render_frame_sarsa_wavefront(
                key, scene, camera, state["vols"], grid, cfg, rl,
                pix_mux=2, interpret=interpret)
            state["vols"] = vols
            return img, aux
        return render

    if mode == "sarsa-mega":
        # The fully in-kernel RL loop (ops.guided_mega_train): learns
        # WHILE rendering each presented frame at megakernel speed — the
        # reference's interactive mode-1 story (main.cu:301-362) at
        # ~23 learning-fps on a v5e (SARSA_BENCH sarsa_mega_train).  The
        # binned Q-table is camera-independent, so moving the camera
        # keeps everything learned so far.
        import dataclasses

        from rlrpt_tpu.ops.guided_mega_train import (init_bin_q,
                                                     rebuild_bin_cdf,
                                                     render_sarsa_mega_train)
        from rlrpt_tpu.ops.megakernel import mt_tables

        rl_k = rl if rl.grid_resolution != 12 else dataclasses.replace(
            rl, grid_resolution=11)
        gr, ub = rl_k.grid_resolution, 4
        sc = scene.to_device()
        t_pad = mt_tables(sc)[0].shape[0] // 4
        q, vis = init_bin_q(t_pad, ub, gr, rl_k.initial_radiance)
        state = {"q": q, "vis": vis,
                 "tb": rebuild_bin_cdf(q, gr, ub, t_pad,
                                       defensive_mix=rl_k.defensive_mix)}

        def render(key, camera):
            img, q, vis, aux = render_sarsa_mega_train(
                key, sc, camera, state["tb"], state["q"], state["vis"],
                cfg, rl_k.radiance_threshold, r_tile=1024, pix_mux=4,
                interpret=interpret)
            state["q"], state["vis"] = q, vis
            state["tb"] = rebuild_bin_cdf(q, gr, ub, t_pad,
                                          defensive_mix=rl_k.defensive_mix)
            return img, aux
        return render

    raise SystemExit(f"unknown --mode {mode}")


def _apply_keys(camera, keys, move=0.1, rot=0.1):
    """Camera::Update key bindings (main.cu:61-88 / camera.cu:9-83)."""
    import pygame

    if keys[pygame.K_UP] or keys[pygame.K_w]:
        camera = camera.move_forwards(move)
    if keys[pygame.K_DOWN] or keys[pygame.K_s]:
        camera = camera.move_backwards(move)
    if keys[pygame.K_LEFT] or keys[pygame.K_a]:
        camera = camera.rotate_left(rot)
    if keys[pygame.K_RIGHT] or keys[pygame.K_d]:
        camera = camera.rotate_right(rot)
    if keys[pygame.K_q]:
        camera = camera.rotate_up(rot)
    if keys[pygame.K_e]:
        camera = camera.rotate_down(rot)
    return camera


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="cornell")
    ap.add_argument("--mode", default="default",
                    choices=("default", "sarsa", "sarsa-mega"))
    ap.add_argument("--size", type=int, default=360)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--bounces", type=int, default=20)
    ap.add_argument("--area-per-sample", type=float, default=0.01)
    ap.add_argument("--frames", type=int, default=0,
                    help=">0: headless scripted run of N frames, then exit")
    ap.add_argument("--out", default="screenshot.bmp")
    args = ap.parse_args(argv)

    if args.frames > 0:
        # Headless: SDL renders into a dummy surface, no display needed.
        os.environ.setdefault("SDL_VIDEODRIVER", "dummy")

    import pygame

    import jax
    from rlrpt_tpu.camera import Camera
    from rlrpt_tpu.config import RadianceVolumeConfig, RenderConfig
    from rlrpt_tpu.scene import cornell_box, presets
    from rlrpt_tpu.utils.image import tonemap, write_bmp

    if args.scene == "cornell":
        scene = cornell_box()
        camera = Camera.create([0.0, 0.0, -3.0])
    else:
        p = presets.get(args.scene)
        scene = p.load()
        camera = Camera.create(p.camera_position)

    cfg = RenderConfig(width=args.size, height=args.size,
                       samples_per_pixel=args.spp,
                       max_ray_bounces=args.bounces)
    rl = RadianceVolumeConfig(area_per_sample=args.area_per_sample)
    interpret = jax.default_backend() == "cpu"
    render = _build_renderer(args.mode, scene, cfg, rl, interpret)

    pygame.init()
    screen = pygame.display.set_mode((args.size, args.size))
    pygame.display.set_caption(f"rlrpt_tpu — {args.scene} ({args.mode})")
    clock = pygame.time.Clock()
    key = jax.random.PRNGKey(1984)
    frame_no = 0
    running = True
    img_u8 = None

    while running:
        t0 = time.time()
        img, aux = render(jax.random.fold_in(key, frame_no), camera)
        img_u8 = tonemap(np.asarray(img))
        # PutPixelSDL equivalent: one blit of the tonemapped frame
        # (sdl_screen.cpp:96-108 clamps to 8-bit per pixel; tonemap does).
        surf = pygame.surfarray.make_surface(img_u8.swapaxes(0, 1))
        screen.blit(surf, (0, 0))
        pygame.display.flip()
        dt = time.time() - t0
        print(f"frame {frame_no}: {dt:.2f}s  "
              f"avg_path {float(aux['avg_path_length']):.2f}", flush=True)
        frame_no += 1

        if args.frames > 0:
            # Scripted headless camera path: orbit + dolly.
            camera = camera.rotate_left(0.05).move_forwards(0.02)
            if frame_no >= args.frames:
                running = False
            continue

        # Interactive: block until a key/quit event, then apply held keys
        # (the reference re-renders every loop regardless; we only
        # re-render on input to keep the chip idle when nothing changes).
        waiting = True
        while waiting and running:
            for ev in pygame.event.get():
                if ev.type == pygame.QUIT:
                    running = False
                elif ev.type == pygame.KEYDOWN:
                    if ev.key == pygame.K_ESCAPE:
                        running = False
                    elif ev.key == pygame.K_f:
                        write_bmp(args.out, img_u8)
                        print(f"saved {args.out}", flush=True)
                    else:
                        waiting = False
            if waiting and running:
                clock.tick(60)
        camera = _apply_keys(camera, pygame.key.get_pressed())

    if img_u8 is not None:
        write_bmp(args.out, img_u8)
        print(f"saved {args.out}", flush=True)
    pygame.quit()


if __name__ == "__main__":
    main()
