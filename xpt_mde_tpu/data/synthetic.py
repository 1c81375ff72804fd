"""Synthetic in-memory snippet dataset for tests and end-to-end checks.

The fake-data capability the reference lacks (SURVEY.md §4): generates
5-frame snippets of a textured fronto-parallel scene observed by a camera
translating in x/z, with exact GT depth, GT target->source poses, camera
intrinsics and (optionally) stereo views with a known extrinsic.

Feature dict layout matches the real loader:
    image5d      [B, S, H, W, 3] float32 in [-1, 1], target LAST
    intrinsic    [B, 3, 3]
    depth_gt     [B, H, W, 1]
    pose_gt      [B, numsrc, 4, 4]  (target -> source)
    [+ _R twins and stereo_T_LR when stereo=True]
"""

from __future__ import annotations

import numpy as np


def _texture(height: int, width: int, rng: np.random.RandomState) -> np.ndarray:
    """Smooth random texture in [-1, 1] with strong horizontal gradients
    (so photometric losses are informative)."""
    freqs = rng.uniform(0.05, 0.4, (4,))
    phases = rng.uniform(0, np.pi * 2, (4,))
    u = np.arange(width, dtype=np.float32)[None, :]
    v = np.arange(height, dtype=np.float32)[:, None]
    img = sum(np.sin(u * f + p) * 0.4 for f, p in zip(freqs[:2], phases[:2]))
    img = img + sum(np.sin(v * f + p) * 0.2 for f, p in zip(freqs[2:], phases[2:]))
    rgb = np.stack([img, np.roll(img, 3, axis=1), np.roll(img, 7, axis=0)], -1)
    return np.clip(rgb, -1, 1).astype(np.float32)


def _render_plane(texture: np.ndarray, fx: float, cam_x: float,
                  depth_m) -> np.ndarray:
    """Render the textured surface seen from camera x-offset ``cam_x``
    (meters): per-row horizontal shift by fx * cam_x / depth(row) pixels,
    sampled exactly through np.interp per row.

    ``depth_m`` may be a scalar (fronto-parallel plane) or an [H] array
    of per-row depths (row-banded relief). With pure x translation the
    rows are independent, so per-row inverse warping stays an EXACT
    render of the 3-D scene -- no cross-row occlusion can occur."""
    height, width = texture.shape[:2]
    depth_rows = np.broadcast_to(np.asarray(depth_m, np.float32), (height,))
    shifts = fx * cam_x / depth_rows
    u = np.arange(width, dtype=np.float32)
    out = np.empty_like(texture)
    for c in range(texture.shape[-1]):
        for v in range(height):
            out[v, :, c] = np.interp(u + shifts[v], u, texture[v, :, c])
    return out


def _depth_profile(height: int, depth_min: float, depth_max: float) -> np.ndarray:
    """Per-row depth profile: smooth near->far->near sweep so depth
    varies several-fold inside the Garg crop (rows 0.41H..0.99H) and a
    constant-depth predictor scores a clearly bad AbsRel."""
    v = np.linspace(0.0, 2.0 * np.pi, height, dtype=np.float32)
    t = 0.5 - 0.5 * np.cos(v)  # 0 -> 1 -> 0, smooth
    return (depth_min + (depth_max - depth_min) * t).astype(np.float32)


def _tint_by_inverse_depth(texture: np.ndarray, depth_rows: np.ndarray,
                           depth_min: float, depth_max: float) -> np.ndarray:
    """Mix an inverse-depth cue into channel 0 so single-image depth is
    learnable from local appearance (convnets are translation-invariant;
    without an appearance cue the net could only read depth off padding
    position). Keeps output in [-1, 1]."""
    inv = 1.0 / depth_rows
    lo, hi = 1.0 / depth_max, 1.0 / depth_min
    cue = (2.0 * (inv - lo) / (hi - lo) - 1.0).astype(np.float32)
    out = texture.copy()
    out[..., 0] = 0.4 * out[..., 0] + 0.6 * cue[:, None]
    return np.clip(out, -1, 1)


class SyntheticDataset:
    """Iterable of feature-dict batches with exact geometry."""

    def __init__(self, batch_size: int = 2, snippet_len: int = 5,
                 height: int = 32, width: int = 64, num_batches: int = 8,
                 stereo: bool = False, seed: int = 0, depth_m: float = 10.0,
                 step_m: float = 0.5, varying_depth: bool = False,
                 vary_motion: bool = False, baseline_m: float = 0.3,
                 moving_object: bool = False,
                 object_vel_ratio: float = 0.6,
                 object_accel: float = 0.0,
                 object_depth_m: float | None = None):
        """``varying_depth`` replaces the constant-depth plane with a
        row-banded relief (depth sweeps depth_m/2 .. depth_m*2 across
        rows) whose inverse depth is appearance-coded into channel 0 --
        the GT-bearing regime the plan-learns checks train on: a
        constant-depth predictor scores AbsRel ~0.3 there, so metric
        improvement is non-trivial. ``vary_motion`` scales each
        example's camera step by a random factor in [0.6, 1.4] so pose
        regression must read the images, not memorize a constant.

        ``moving_object`` (VERDICT r3 #2) adds an independently moving
        textured row-band: rows ``object_rows()`` hold a foreground
        surface at ``object_depth_m`` whose world x-position moves at
        ``object_vel_ratio`` x the camera's per-frame step. Per-row
        rendering stays an EXACT render (pure-x motions). The band
        breaks the rigid-scene assumption exactly like the moving cars
        the reference's CombinedLoss exists for (losses.py:235-279):
        for camera step s and object velocity w = r*s, photometric
        consistency is satisfied by the WRONG depth
        d_bias = d_obj * s/(s-w) = d_obj/(1-r), the classic
        moving-object depth bias -- so rigid-only training converges to
        a measurably biased band depth while the flow branch can model
        the band's true correspondence.

        ``object_accel`` (r5, dynamic-cmb protocol v6): at constant
        velocity the biased depth closes the warp EXACTLY for every
        source frame (the trap state's photometric error is ~0.01,
        measured -- below any achievable flow error, so once entered no
        mask criterion can evict it). A nonzero accel makes the
        per-source equivalent velocity ratio r_t = r + accel*t/2 vary
        across the snippet: NO single depth closes all sources (real
        moving objects are in this regime -- image-rate motion is never
        exactly constant), the trap state keeps a high photometric
        floor that a learned flow (per-source fields) CAN undercut, and
        the cmb mask can then exclude the band durably. Depth/pose GT
        are unchanged; flow GT per source t is
        fx*(t*step - x_obj(t))/d_obj with x_obj(t) = step*t*(r +
        accel*t/2)."""
        self.batch_size = batch_size
        self.snippet_len = snippet_len
        self.height = height
        self.width = width
        self.num_batches = num_batches
        self.stereo = stereo
        self.seed = seed
        self.depth_m = depth_m
        self.step_m = step_m
        self.vary_motion = vary_motion
        self.baseline_m = baseline_m
        if varying_depth:
            self.depth_rows = _depth_profile(height, depth_m * 0.5,
                                             depth_m * 2.0)
        else:
            self.depth_rows = np.full((height,), depth_m, np.float32)
        self.varying_depth = varying_depth
        self.moving_object = moving_object
        self.object_vel_ratio = object_vel_ratio
        self.object_accel = object_accel
        self.object_depth_m = (object_depth_m if object_depth_m is not None
                               else depth_m * 0.7)
        if moving_object:
            assert not stereo, "moving_object supports monocular worlds"
        fx = width * 0.6
        self.intrinsic = np.array(
            [[fx, 0, width / 2], [0, fx, height / 2], [0, 0, 1]], np.float32)

    def object_rows(self) -> tuple[int, int]:
        """The moving band [r0, r1): inside the Garg crop (rows
        0.41H..0.99H, evaluate/depth_metrics.py) so the band's depth
        shows up in AbsRel."""
        return int(self.height * 0.50), int(self.height * 0.72)

    def __len__(self):
        return self.num_batches

    def config_keys(self):
        keys = ["image", "intrinsic", "depth_gt", "pose_gt"]
        if self.stereo:
            keys += ["image_R", "intrinsic_R", "pose_gt_R", "stereo_T_LR"]
        return keys

    def _render(self, texture: np.ndarray, cam_x: float) -> np.ndarray:
        return _render_plane(texture, self.intrinsic[0, 0], cam_x,
                             self.depth_rows)

    def _make_example(self, rng: np.random.RandomState):
        s = self.snippet_len
        texture = _texture(self.height, self.width, rng)
        if self.varying_depth:
            texture = _tint_by_inverse_depth(texture, self.depth_rows,
                                             self.depth_m * 0.5,
                                             self.depth_m * 2.0)
        step = self.step_m
        if self.vary_motion:
            step = step * rng.uniform(0.6, 1.4)
        # camera positions: sources at [-2, -1, +1, +2] * step, target at 0
        # (target frame LAST in the stack, example_maker.py:119-121);
        # frame index IS the timestamp (one step per frame)
        times = [t for t in range(-2, s - 2)]
        src_times = [t for t in times if t != 0][: s - 1]
        src_offsets = [t * step for t in src_times]
        frames = [self._render(texture, o) for o in src_offsets]
        frames.append(texture)  # target at x=0

        if self.moving_object:
            r0, r1 = self.object_rows()
            d_obj = self.object_depth_m
            r, a = self.object_vel_ratio, self.object_accel
            obj_tex = _texture(r1 - r0, self.width, rng)
            if self.varying_depth:
                obj_tex = _tint_by_inverse_depth(
                    obj_tex, np.full((r1 - r0,), d_obj, np.float32),
                    self.depth_m * 0.5, self.depth_m * 2.0)
            for frame, t in zip(frames, src_times + [0]):
                # object world-x at time t: x_obj(t) = step*t*(r + a*t/2)
                # (constant velocity when a=0; the per-source equivalent
                # ratio is r + a*t/2); image shift is set by the
                # camera-relative offset (exact per-row render)
                x_obj = step * t * (r + a * t / 2.0)
                frame[r0:r1] = _render_plane(
                    obj_tex, self.intrinsic[0, 0], t * step - x_obj, d_obj)
        image5d = np.stack(frames, axis=0)

        # target->source transform for camera at +o: x_src = x - o
        pose_gt = np.tile(np.eye(4, dtype=np.float32), (s - 1, 1, 1))
        for i, o in enumerate(src_offsets):
            pose_gt[i, 0, 3] = -o
        depth_rows = self.depth_rows.copy()
        if self.moving_object:
            r0, r1 = self.object_rows()
            depth_rows[r0:r1] = self.object_depth_m
        depth_gt = np.tile(depth_rows[:, None, None],
                           (1, self.width, 1)).astype(np.float32)
        return image5d, depth_gt, pose_gt

    def __iter__(self):
        rng = np.random.RandomState(self.seed)
        for _ in range(self.num_batches):
            images, depths, poses = [], [], []
            for _ in range(self.batch_size):
                im, de, po = self._make_example(rng)
                images.append(im)
                depths.append(de)
                poses.append(po)
            feats = {
                "image5d": np.stack(images),
                "intrinsic": np.tile(self.intrinsic, (self.batch_size, 1, 1)),
                "depth_gt": np.stack(depths),
                "pose_gt": np.stack(poses),
            }
            if self.stereo:
                baseline = self.baseline_m
                # right camera = left camera shifted by +baseline; with a
                # fronto-parallel plane the right view is an exact re-render
                # of each left frame
                images_r = [
                    np.stack([self._render(frame, baseline)
                              for frame in feats["image5d"][b]])
                    for b in range(self.batch_size)]
                feats["image5d_R"] = np.stack(images_r).astype(np.float32)
                feats["intrinsic_R"] = feats["intrinsic"].copy()
                feats["pose_gt_R"] = feats["pose_gt"].copy()
                t_lr = np.tile(np.eye(4, dtype=np.float32),
                               (self.batch_size, 1, 1))
                t_lr[:, 0, 3] = baseline  # right->left: x_L = x_R + b
                feats["stereo_T_LR"] = t_lr
            yield feats


def _rot_y(theta: float) -> np.ndarray:
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)


class PlanarSceneDataset:
    """Tilted textured plane rendered EXACTLY under full SE(3) camera
    motion (VERDICT r3 #4/#5).

    The scene is one infinite plane whose depth in the canonical target
    view sweeps ``depth_max`` (top row) to ``depth_min`` (bottom row) --
    a ground-plane-like relief. Texture is an ANALYTIC sum of sinusoids
    in the plane's own (s, tau) coordinates, so any camera pose renders
    exactly: per pixel, intersect the ray with the plane in closed form
    and evaluate the texture there. Unlike SyntheticDataset's per-row
    renderer (pure-x motion only), this supports camera rotation, which
    puts all 6 twist DoF into ``pose_gt``: cameras translate in x AND
    yaw about y by ``yaw_deg`` per frame, so the pose head's rotation
    output is exercised non-trivially (the reference's odometry eval is
    full SE(3), eval_utils.py:28-75).

    The inverse of the canonical-view depth is painted into channel 0
    as a surface property (a function of the plane coordinate tau), so
    single-image depth stays learnable from local appearance.

    Feature dict layout matches SyntheticDataset (monocular keys).
    """

    def __init__(self, batch_size: int = 2, snippet_len: int = 5,
                 height: int = 32, width: int = 64, num_batches: int = 8,
                 seed: int = 0, depth_min: float = 5.0,
                 depth_max: float = 20.0, step_m: float = 0.5,
                 yaw_deg: float = 0.0, vary_motion: bool = False):
        self.batch_size = batch_size
        self.snippet_len = snippet_len
        self.height = height
        self.width = width
        self.num_batches = num_batches
        self.seed = seed
        self.depth_min = depth_min
        self.depth_max = depth_max
        self.step_m = step_m
        self.yaw_deg = yaw_deg
        self.vary_motion = vary_motion
        fx = width * 0.6
        cx, cy = width / 2, height / 2
        self.intrinsic = np.array(
            [[fx, 0, cx], [0, fx, cy], [0, 0, 1]], np.float32)
        # plane {X : n.X = c} with n = (0, ny, 1): canonical depth
        # z(v) = c / (1 + ny*(v-cy)/fy) hits depth_max at v=0 and
        # depth_min at v=H-1 (near at the bottom, like a road)
        a_top, a_bot = (0 - cy) / fx, (height - 1 - cy) / fx
        ny = (depth_max - depth_min) / (depth_min * a_bot
                                        - depth_max * a_top)
        self.normal = np.array([0.0, ny, 1.0], np.float32)
        self.plane_c = depth_max * (1.0 + ny * a_top)
        self.p0 = np.array([0.0, 0.0, self.plane_c], np.float32)
        self.e1 = np.array([1.0, 0.0, 0.0], np.float32)
        e2 = np.array([0.0, 1.0, -ny], np.float32)
        self.e2 = (e2 / np.linalg.norm(e2)).astype(np.float32)

    def __len__(self):
        return self.num_batches

    def config_keys(self):
        return ["image", "intrinsic", "depth_gt", "pose_gt"]

    def _sample_texture(self, rng: np.random.RandomState):
        """Analytic plane texture: per channel, a sum of smooth
        sinusoids in plane meters (wavelengths ~2-8 m: several pixels
        at every depth in range, so bilinear resampling inside the loss
        stays accurate)."""
        freqs = rng.uniform(0.4, 1.5, (3, 4, 2)).astype(np.float32)
        phases = rng.uniform(0, 2 * np.pi, (3, 4)).astype(np.float32)
        amps = rng.uniform(0.15, 0.35, (3, 4)).astype(np.float32)

        def tex(s, tau):
            chans = []
            for ch in range(3):
                val = sum(amps[ch, k] * np.sin(freqs[ch, k, 0] * s
                                               + freqs[ch, k, 1] * tau
                                               + phases[ch, k])
                          for k in range(4))
                chans.append(val)
            img = np.stack(chans, axis=-1).astype(np.float32)
            # inverse canonical depth as a surface-painted cue (ch 0)
            z_canon = self.p0[2] + tau * self.e2[2]
            lo, hi = 1.0 / self.depth_max, 1.0 / self.depth_min
            cue = 2.0 * (1.0 / np.clip(z_canon, self.depth_min * 0.5,
                                       self.depth_max * 2.0) - lo) \
                / (hi - lo) - 1.0
            img[..., 0] = 0.4 * img[..., 0] + 0.6 * np.clip(cue, -1, 1)
            return np.clip(img, -1, 1)
        return tex

    def _render_pose(self, tex, rotation: np.ndarray, position: np.ndarray):
        """Exact render + depth map for camera-to-world (R, t)."""
        height, width = self.height, self.width
        k = self.intrinsic
        uu, vv = np.meshgrid(np.arange(width, dtype=np.float32),
                             np.arange(height, dtype=np.float32))
        dirs_c = np.stack([(uu - k[0, 2]) / k[0, 0],
                           (vv - k[1, 2]) / k[1, 1],
                           np.ones_like(uu)], axis=-1)
        dirs_w = dirs_c @ rotation.T
        denom = dirs_w @ self.normal
        lam = (self.plane_c - position @ self.normal) / denom
        points = position + lam[..., None] * dirs_w
        rel = points - self.p0
        img = tex(rel @ self.e1, rel @ self.e2)
        return img.astype(np.float32), lam.astype(np.float32)  # z_c == lam

    def _make_example(self, rng: np.random.RandomState):
        s = self.snippet_len
        tex = self._sample_texture(rng)
        step, yaw = self.step_m, np.deg2rad(self.yaw_deg)
        if self.vary_motion:
            step = step * rng.uniform(0.6, 1.4)
            yaw = yaw * rng.uniform(0.6, 1.4)
        times = [t for t in range(-2, s - 2) if t != 0][: s - 1]
        frames, poses = [], []
        for t in times:
            rot = _rot_y(yaw * t)
            pos = np.array([t * step, 0.0, 0.0], np.float32)
            img, _ = self._render_pose(tex, rot, pos)
            frames.append(img)
            # target->source: X_s = R^T (X_t - pos)
            t2s = np.eye(4, dtype=np.float32)
            t2s[:3, :3] = rot.T
            t2s[:3, 3] = -rot.T @ pos
            poses.append(t2s)
        target, depth = self._render_pose(
            tex, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
        frames.append(target)
        return (np.stack(frames), depth[..., None].astype(np.float32),
                np.stack(poses))

    def __iter__(self):
        rng = np.random.RandomState(self.seed)
        for _ in range(self.num_batches):
            images, depths, poses = [], [], []
            for _ in range(self.batch_size):
                im, de, po = self._make_example(rng)
                images.append(im)
                depths.append(de)
                poses.append(po)
            yield {
                "image5d": np.stack(images),
                "intrinsic": np.tile(self.intrinsic,
                                     (self.batch_size, 1, 1)),
                "depth_gt": np.stack(depths),
                "pose_gt": np.stack(poses),
            }


class SyntheticReader:
    """DataReaderBase twin of :class:`SyntheticDataset` for the
    shard-making path: "drives" are procedurally rendered textured-plane
    sequences with exact GT depth/poses/intrinsics, so
    ``ShardMaker(cfg, "synthetic", split, None)`` builds real shards
    with zero raw data -- the smoke/demo capability the reference lacks
    entirely (SURVEY.md §4). ``base_path`` may be a dict overriding
    height/width/num_frames/drives/step_m/depth_m."""

    def __init__(self, split: str = "train", base_path=None):
        from xpt_mde_tpu.data.readers.reader_base import DataReaderBase
        self.split = split
        self.base_path = base_path
        opts = dict(base_path) if isinstance(base_path, dict) else {}
        self.height = int(opts.get("height", 64))
        self.width = int(opts.get("width", 128))
        self.num_frames = int(opts.get("num_frames", 12))
        self.n_drives = int(opts.get("drives", 2))
        self.step_m = float(opts.get("step_m", 0.5))
        self.depth_m = float(opts.get("depth_m", 10.0))
        fx = self.width * 0.6
        self.intrinsic = np.array(
            [[fx, 0, self.width / 2], [0, fx, self.height / 2], [0, 0, 1]],
            np.float32)
        self.texture = None
        self.frame_names: list = []

    def list_drive_paths(self):
        return [f"synthetic_{i:02d}" for i in range(self.n_drives)]

    def init_drive(self, drive_path):
        seed = int(str(drive_path).rsplit("_", 1)[-1])
        self.texture = _texture(self.height, self.width,
                                np.random.RandomState(seed))
        self.frame_names = [f"{drive_path}/{i:04d}"
                            for i in range(self.num_frames)]

    def num_frames_(self):
        return self.num_frames

    def get_range_(self):
        return range(2, self.num_frames - 2)

    def _render(self, cam_x: float) -> np.ndarray:
        return _render_plane(self.texture, self.intrinsic[0, 0], cam_x,
                             self.depth_m)

    def get_image(self, index, right=False):
        if right:
            return None
        img = self._render(index * self.step_m)
        return ((np.clip(img, -1, 1) + 1) / 2 * 255).astype(np.uint8)

    def get_pose(self, index, right=False):
        pose = np.eye(4, dtype=np.float32)  # camera-to-world
        pose[0, 3] = index * self.step_m
        return pose

    def get_point_cloud(self, index, right=False):
        from xpt_mde_tpu.data.depth_map import depth_map_to_point_cloud
        depth = np.full((self.height, self.width), self.depth_m, np.float32)
        return depth_map_to_point_cloud(depth, self.intrinsic)

    def get_intrinsic(self, index=0, right=False):
        return self.intrinsic.copy()

    def get_stereo_extrinsic(self, index=0):
        return None

    def index_to_id(self, index):
        return index
