"""Per-Gaussian screen-space preprocessing for the differentiable splatter.

Vectorized (one fused pass over all N Gaussians — MXU/VPU friendly)
equivalent of the preprocess stage of the reference's external CUDA
rasterizer (`diff_gaussian_rasterization`, see SURVEY.md §2.5): 3D
covariance from quaternion+scale, world->view transform, EWA projection of
the covariance to 2D, anti-aliasing opacity compensation (the
``antialiasing=True`` mode the reference enables at
gaussian_renderer/__init__.py:58), conic/radius computation, NDC->pixel
mapping and clamped SH->RGB evaluation.

Conventions: camera matrices are *transposed* (row-vector) like the
reference pipeline; near-plane cull at view z < 0.2; all outputs are
flat arrays over N with a validity mask instead of dynamic culling.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from unipre3d_tpu.utils.camera import ndc2pix, quat_to_rotmat
from unipre3d_tpu.utils.sh import sh_to_rgb_clamped

NEAR_CULL_Z = 0.2
AA_BLUR = 0.3  # low-pass filter variance added to the 2D covariance (px^2)


class ProjectedGaussians(NamedTuple):
    """Screen-space Gaussians, all [N, ...]."""
    mean2d: jnp.ndarray      # [N, 2] pixel coords (x, y)
    conic: jnp.ndarray       # [N, 3] inverse 2D covariance (a, b, c)
    color: jnp.ndarray       # [N, 3] RGB from SH (clamped >= 0)
    opacity: jnp.ndarray     # [N] after AA compensation
    depth: jnp.ndarray       # [N] view-space z
    radius: jnp.ndarray      # [N] int32 pixel radius (0 = culled)
    valid: jnp.ndarray       # [N] bool


def compute_cov3d(scales: jnp.ndarray, rotations: jnp.ndarray,
                  scale_modifier: float = 1.0) -> jnp.ndarray:
    """3D covariance Sigma = R S^2 R^T. scales [N,3], rotations [N,4]
    (normalized wxyz quaternions) -> [N, 3, 3]."""
    R = quat_to_rotmat(rotations)
    S2 = (scales * scale_modifier) ** 2
    return jnp.einsum("nij,nj,nkj->nik", R, S2, R,
                      precision=jax.lax.Precision.HIGHEST)


def _rot_columns(rotations: jnp.ndarray):
    """Columns r_k of the rotation matrix from wxyz quaternions, as three
    [N, 3] arrays — explicit elementwise formulas (batched [N,3,3]
    einsums lower terribly on the MXU; the CUDA reference scalarizes the
    covariance math the same way, forward.cu computeCov3D/2D)."""
    w, x, y, z = (rotations[:, 0], rotations[:, 1], rotations[:, 2],
                  rotations[:, 3])
    r0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y + w * z),
                    2 * (x * z - w * y)], axis=1)
    r1 = jnp.stack([2 * (x * y - w * z), 1 - 2 * (x * x + z * z),
                    2 * (y * z + w * x)], axis=1)
    r2 = jnp.stack([2 * (x * z + w * y), 2 * (y * z - w * x),
                    1 - 2 * (x * x + y * y)], axis=1)
    return r0, r1, r2


def preprocess_gaussians(
    means3d: jnp.ndarray,        # [N, 3] world positions
    opacities: jnp.ndarray,      # [N] or [N, 1]
    scales: jnp.ndarray,         # [N, 3]
    rotations: jnp.ndarray,      # [N, 4] normalized (w, x, y, z)
    shs: jnp.ndarray,            # [N, K, 3] SH coeffs (dc first)
    world_view: jnp.ndarray,     # [4, 4] transposed world->view
    full_proj: jnp.ndarray,      # [4, 4] transposed full projection
    cam_center: jnp.ndarray,     # [3]
    img_h: int, img_w: int,
    tanfovx: float, tanfovy: float,
    sh_degree: int,
    scale_modifier: float = 1.0,
    antialiasing: bool = True,
    gaussian_mask: jnp.ndarray | None = None,  # [N] bool padding mask
) -> ProjectedGaussians:
    N = means3d.shape[0]
    f32 = jnp.float32
    means3d = means3d.astype(f32)
    opacities = opacities.reshape(N).astype(f32)

    # --- world -> view / clip (row-vector convention) ---
    # explicit elementwise expansion: [N,4] @ [4,4] batched-tiny matmuls
    # under the (batch, view) vmaps are ~10x slower on the 128x128 MXU
    # than broadcast multiply-adds (same trap as the covariance einsums)
    wv = world_view.astype(f32)
    fp4 = full_proj.astype(f32)

    def xform(m):  # rows of p_hom . m, with the implicit 1 * m[3]
        return [means3d[:, 0] * m[0, j] + means3d[:, 1] * m[1, j]
                + means3d[:, 2] * m[2, j] + m[3, j] for j in range(4)]

    pv = xform(wv)
    pc = xform(fp4)
    p_view = jnp.stack(pv, axis=1)                                    # [N, 4]
    p_w = 1.0 / (pc[3] + 1e-7)

    depth = pv[2]
    in_front = depth > NEAR_CULL_Z

    mean2d = jnp.stack([ndc2pix(pc[0] * p_w, img_w),
                        ndc2pix(pc[1] * p_w, img_h)], axis=1)

    # --- EWA: project 3D covariance to screen space ---
    # Explicit elementwise expansion of J W (R S^2 R^T) W^T J^T: with
    # a1 = row 0 of (J W), a2 = row 1, and r_k the rotation columns,
    # c_ab = sum_k s_k^2 (r_k . a_a)(r_k . a_b). Batched [N,3,3]
    # einsums are ~10x slower on TPU (tiny matmuls on the 128x128 MXU).
    focal_x = img_w / (2.0 * tanfovx)
    focal_y = img_h / (2.0 * tanfovy)

    tz = jnp.where(jnp.abs(depth) > 1e-6, depth, 1e-6)
    limx, limy = 1.3 * tanfovx, 1.3 * tanfovy
    txtz = jnp.clip(p_view[:, 0] / tz, -limx, limx)
    tytz = jnp.clip(p_view[:, 1] / tz, -limy, limy)
    tx = txtz * tz
    ty = tytz * tz

    # world->view rotation in math (column-vector) convention: the stored
    # matrix is transposed, so rows of world_view[:3,:3] ARE R_wc columns;
    # v_view = v_world @ WV[:3,:3]  =>  R_wc = WV[:3,:3]^T
    W = world_view[:3, :3].astype(f32).T  # R_wc, [3, 3] constants
    j00 = focal_x / tz
    j02 = -focal_x * tx / (tz * tz)
    j11 = focal_y / tz
    j12 = -focal_y * ty / (tz * tz)
    # a1[j] = j00 * W[0, j] + j02 * W[2, j];  a2[j] = j11 W[1,j] + j12 W[2,j]
    a1 = [j00 * W[0, j] + j02 * W[2, j] for j in range(3)]  # 3 x [N]
    a2 = [j11 * W[1, j] + j12 * W[2, j] for j in range(3)]

    r0, r1, r2 = _rot_columns(rotations.astype(f32))
    s2 = (scales.astype(f32) * scale_modifier) ** 2  # [N, 3]
    c_xx = jnp.zeros_like(tz)
    c_xy = jnp.zeros_like(tz)
    c_yy = jnp.zeros_like(tz)
    for k, rk in enumerate((r0, r1, r2)):
        u = rk[:, 0] * a1[0] + rk[:, 1] * a1[1] + rk[:, 2] * a1[2]
        v = rk[:, 0] * a2[0] + rk[:, 1] * a2[1] + rk[:, 2] * a2[2]
        c_xx = c_xx + s2[:, k] * u * u
        c_xy = c_xy + s2[:, k] * u * v
        c_yy = c_yy + s2[:, k] * v * v
    det_orig = c_xx * c_yy - c_xy * c_xy
    # low-pass: every splat is at least ~1px wide (reference adds 0.3)
    c_xx = c_xx + AA_BLUR
    c_yy = c_yy + AA_BLUR
    det_blur = c_xx * c_yy - c_xy * c_xy

    if antialiasing:
        # opacity compensation for the blur (reference h_convolution_scaling)
        h_scale = jnp.sqrt(jnp.maximum(2.5e-5, det_orig / det_blur))
        opacities = opacities * h_scale

    det_ok = det_blur > 0.0
    inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det_blur, 1.0), 0.0)
    conic = jnp.stack([c_yy * inv_det, -c_xy * inv_det, c_xx * inv_det],
                      axis=1)

    # screen-space extent: 3 sigma of the major eigenvalue
    mid = 0.5 * (c_xx + c_yy)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det_blur))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(lambda1))

    valid = in_front & det_ok
    if gaussian_mask is not None:
        valid = valid & gaussian_mask
    # quick tile-level reject: bbox fully outside the image
    on_screen = ((mean2d[:, 0] + radius_f >= 0) & (mean2d[:, 0] - radius_f < img_w)
                 & (mean2d[:, 1] + radius_f >= 0) & (mean2d[:, 1] - radius_f < img_h))
    valid = valid & on_screen
    radius = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)

    # --- SH -> RGB --- (safe norm: NaN-free gradient at dirs == 0)
    dirs = means3d - cam_center.astype(f32)[None, :]
    dirs = dirs / jnp.sqrt(jnp.sum(dirs ** 2, axis=-1, keepdims=True) + 1e-12)
    color = sh_to_rgb_clamped(sh_degree, shs.astype(f32), dirs)

    return ProjectedGaussians(
        mean2d=mean2d, conic=conic, color=color,
        opacity=jnp.where(valid, opacities, 0.0),
        depth=depth, radius=radius, valid=valid)
