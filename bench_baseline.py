#!/usr/bin/env python
"""Measure the CPU-reference NeRF training throughput baseline.

Faithful re-creation of the reference's training iteration
(Phase2/train.py:443-465) in torch on CPU: host-side Python ray batching
(generateBatch, :104-127), the active NeRFmodel architecture, chunked render
(:187-271), MSE backward, Adam step — with
torch.autograd.set_detect_anomaly(True) exactly as the reference always
enables (:390).  Writes bench_baseline.json consumed by bench.py.

Run rarely (slow by construction — that's the point).
"""

import argparse
import json
import random
import time

import numpy as np
import torch
import torch.nn as nn


class RefNeRF(nn.Module):
    """Same graph as Phase2/NeRFModel.py:101-202 (active class)."""

    def __init__(self, Lp=10, Ld=4, hidden=256):
        super().__init__()
        self.Lp, self.Ld = Lp, Ld
        pin, din = 3 * (2 * Lp + 1), 3 * (2 * Ld + 1)
        self.fc1 = nn.Linear(pin, hidden)
        self.fc_layers = nn.ModuleList(
            [nn.Linear(hidden, hidden) for _ in range(4)])
        self.skip = nn.Linear(hidden + pin, hidden)
        self.fc_layers2 = nn.ModuleList(
            [nn.Linear(hidden, hidden) for _ in range(3)])
        self.density = nn.Linear(hidden, 1)
        self.feature = nn.Linear(hidden, hidden)
        self.rgb1 = nn.Linear(hidden + din, 128)
        self.rgb2 = nn.Linear(128, 3)

    def pe(self, x, L):
        out = [x]
        for i in range(L):
            out += [torch.sin(2.0**i * np.pi * x), torch.cos(2.0**i * np.pi * x)]
        return torch.cat(out, -1)

    def forward(self, pos, d):
        pe, de = self.pe(pos, self.Lp), self.pe(d, self.Ld)
        h = torch.relu(self.fc1(pe))
        for i, layer in enumerate(self.fc_layers):
            h = torch.relu(layer(h))
            if i == 3:
                h = torch.relu(self.skip(torch.cat([h, pe], -1)))
        for layer in self.fc_layers2:
            h = torch.relu(layer(h))
        dens = torch.nn.functional.softplus(self.density(h))
        feat = torch.relu(self.feature(h))
        rgb = torch.relu(self.rgb1(torch.cat([feat, de], -1)))
        return dens, torch.sigmoid(self.rgb2(rgb))


def generate_batch(images, poses, K, n_rays, W, H):
    """Python-loop batcher, as Phase2/train.py:104-127."""
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    rays = []
    for _ in range(n_rays):
        i = random.randint(0, len(images) - 1)
        px, py = random.randint(0, W - 1), random.randint(0, H - 1)
        d = np.array([(px - cx) / fx, (py - cy) / fy, 1.0])
        d = poses[i][:3, :3] @ d
        d = d / np.linalg.norm(d)
        rays.append(np.concatenate([poses[i][:3, 3], d, images[i][py, px]]))
    return np.asarray(rays, dtype=np.float32)


def render(model, o, d, n_sample, chunk, near=2.0, far=6.0):
    N = o.shape[0]
    t = torch.linspace(0, 1, n_sample).expand(N, n_sample)
    mids = 0.5 * (t[..., 1:] + t[..., :-1])
    upper = torch.cat([mids, t[..., -1:]], -1)
    lower = torch.cat([t[..., :1], mids], -1)
    t = lower + (upper - lower) * torch.rand_like(t)
    z = near + (far - near) * t
    pts = o[:, None] + d[:, None] * z[..., None]
    dirs = d[:, None].expand(-1, n_sample, -1)
    pf, df_ = pts.reshape(-1, 3), dirs.reshape(-1, 3)
    dens, rgbs = [], []
    for i in range(0, pf.shape[0], chunk):
        dn, rg = model(pf[i:i + chunk], df_[i:i + chunk])
        dens.append(dn)
        rgbs.append(rg)
    dens = torch.cat(dens).reshape(N, n_sample)
    rgbs = torch.cat(rgbs).reshape(N, n_sample, 3)
    dists = torch.cat(
        [z[..., 1:] - z[..., :-1], torch.full_like(z[..., :1], 1e-3)], -1)
    alpha = 1 - torch.exp(-dens * dists)
    T = torch.ones_like(alpha)
    cp = torch.cumprod(1 - alpha + 1e-10, 1)
    T[:, 1:] = cp[:, :-1]
    w = alpha * T
    return (w[..., None] * rgbs).sum(1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_rays", type=int, default=8192)
    ap.add_argument("--n_sample", type=int, default=256)
    ap.add_argument("--chunk", type=int, default=32768)
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    torch.autograd.set_detect_anomaly(True)  # always-on in the reference
    rng = np.random.default_rng(0)
    W = H = 400
    images = rng.uniform(0, 1, (8, H, W, 3)).astype(np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (8, 1, 1))
    poses[:, 2, 3] = 4.0
    K = np.array([[555.0, 0, W / 2], [0, 555.0, H / 2], [0, 0, 1]])

    model = RefNeRF()
    opt = torch.optim.Adam(model.parameters(), lr=5e-4)
    # warmup
    rays = torch.tensor(generate_batch(images, poses, K, 64, W, H))
    loss = nn.MSELoss()(render(model, rays[:, :3], rays[:, 3:6], 16, args.chunk),
                        rays[:, 6:9])
    loss.backward()

    t0 = time.time()
    for _ in range(args.steps):
        rays = torch.tensor(
            generate_batch(images, poses, K, args.n_rays, W, H))
        opt.zero_grad()
        pred = render(model, rays[:, :3], rays[:, 3:6], args.n_sample,
                      args.chunk)
        loss = nn.MSELoss()(pred, rays[:, 6:9])
        loss.backward()
        opt.step()
    dt = time.time() - t0
    rays_per_sec = args.n_rays * args.steps / dt
    out = {
        "cpu_reference_rays_per_sec": rays_per_sec,
        "n_rays": args.n_rays,
        "n_sample": args.n_sample,
        "steps": args.steps,
        "seconds_per_step": dt / args.steps,
        "torch_threads": torch.get_num_threads(),
    }
    with open("bench_baseline.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
