"""Disney principled BRDF: evaluation, importance sampling, PDFs.

Vectorized port of /root/reference/src/disney_brdf.cuh (itself based on NBVH's
material.cuh). All vector quantities are channel-major [3, N]
(ops/linalg.py layout note); material parameters arrive as a BrdfMaterial of
per-ray arrays (the reference passes a Material struct whose constant
`.value` fields were overridden per hit — cuda_renderer_neural.cu:441-446).

Two reference quirks are reproduced deliberately (they shape the sampled
distribution and the renderer is self-consistent around them):
  * sample_ggx / sample_gtr_1_h compute sin_theta = 1 - cos^2 (NOT sqrt)
    (disney_brdf.cuh:227, 266);
  * the 3-component PDF uses unclamped n·h / h·o for the specular lobe
    (disney_brdf.cuh:495-498).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .linalg import cross, dot, lerp, luminance, normalize, reflect, splat, where3

INV_PI = 0.31830988618379067154
TWO_PI = 6.283185307179586


class BrdfMaterial(NamedTuple):
    base_color: jnp.ndarray       # [3, N]
    metallic: jnp.ndarray         # [N]
    roughness: jnp.ndarray        # [N]
    specular: jnp.ndarray         # [N]
    specular_tint: jnp.ndarray    # [N]
    anisotropy: jnp.ndarray       # [N]
    sheen: jnp.ndarray            # [N]
    sheen_tint: jnp.ndarray       # [N]
    clearcoat: jnp.ndarray        # [N]
    clearcoat_gloss: jnp.ndarray  # [N]
    ior: jnp.ndarray              # [N]
    specular_transmission: jnp.ndarray  # [N]

    @staticmethod
    def broadcast_from_row(row, n: int) -> "BrdfMaterial":
        """Expand a global-material scalar row [NUM_SCALARS] to [N] batches."""
        from ..scene.materials import (
            P_ANISOTROPY, P_BASE_B, P_BASE_G, P_BASE_R, P_CLEARCOAT,
            P_CLEARCOAT_GLOSS, P_IOR, P_METALLIC, P_ROUGHNESS, P_SHEEN,
            P_SHEEN_TINT, P_SPECULAR, P_SPECULAR_TINT, P_SPEC_TRANS)

        def b(x):
            return jnp.broadcast_to(x, (n,))

        base = jnp.stack([row[P_BASE_R], row[P_BASE_G], row[P_BASE_B]])
        return BrdfMaterial(
            base_color=jnp.broadcast_to(base[:, None], (3, n)),
            metallic=b(row[P_METALLIC]),
            roughness=b(row[P_ROUGHNESS]),
            specular=b(row[P_SPECULAR]),
            specular_tint=b(row[P_SPECULAR_TINT]),
            anisotropy=b(row[P_ANISOTROPY]),
            sheen=b(row[P_SHEEN]),
            sheen_tint=b(row[P_SHEEN_TINT]),
            clearcoat=b(row[P_CLEARCOAT]),
            clearcoat_gloss=b(row[P_CLEARCOAT_GLOSS]),
            ior=b(row[P_IOR]),
            specular_transmission=b(row[P_SPEC_TRANS]),
        )


def saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def schlick_weight(cos_theta):
    m = saturate(1.0 - cos_theta)
    return (m * m) * (m * m) * m


def fresnel_dielectric(cos_theta_i, eta_i, eta_t):
    g2 = (eta_t * eta_t) / (eta_i * eta_i) - 1.0 + cos_theta_i * cos_theta_i
    g = jnp.sqrt(jnp.maximum(g2, 0.0))
    a = (g - cos_theta_i) / (g + cos_theta_i)
    b = ((cos_theta_i * (g + cos_theta_i) - 1.0)
         / (cos_theta_i * (g - cos_theta_i) + 1.0))
    f = 0.5 * a * a * (1.0 + b * b)
    return jnp.where(g2 < 0.0, 1.0, f)


def gtr_1(cos_theta_h, alpha):
    a2 = alpha * alpha
    dense = INV_PI * (a2 - 1.0) / (jnp.log(a2) * (1.0 + (a2 - 1.0) * cos_theta_h * cos_theta_h))
    return jnp.where(alpha >= 1.0, INV_PI, dense)


def gtr_2(cos_theta_h, alpha):
    a2 = alpha * alpha
    denom = 1.0 + (a2 - 1.0) * cos_theta_h * cos_theta_h
    return INV_PI * a2 / (denom * denom)


def gtr_2_aniso(h_dot_n, h_dot_x, h_dot_y, alpha_x, alpha_y):
    q = ((h_dot_x / alpha_x) ** 2 + (h_dot_y / alpha_y) ** 2
         + h_dot_n * h_dot_n)
    return INV_PI / (alpha_x * alpha_y * (q * q))


def smith_shadowing_ggx(n_dot_o, alpha_g):
    a = alpha_g * alpha_g
    b = n_dot_o * n_dot_o
    return 1.0 / (n_dot_o + jnp.sqrt(jnp.maximum(a + b - a * b, 0.0)))


def smith_shadowing_ggx_aniso(n_dot_o, o_dot_x, o_dot_y, alpha_x, alpha_y):
    return 1.0 / (n_dot_o + jnp.sqrt(
        (o_dot_x * alpha_x) ** 2 + (o_dot_y * alpha_y) ** 2 + n_dot_o ** 2))


def same_hemisphere(wo, wi, n):
    return dot(wo, n) * dot(wi, n) > 0.0


def _tint(base_color):
    lum = luminance(base_color)
    safe = jnp.where(lum > 0.0, lum, 1.0)
    return jnp.where((lum > 0.0)[None, :], base_color / safe[None, :], 1.0)


# ---------------------------------------------------------------------------
# Lobes (disney_brdf.cuh:88-190)
# ---------------------------------------------------------------------------

def disney_diffuse(mat, n, wo, wi):
    w_h = normalize(wi + wo, eps=1e-20)
    n_dot_o = jnp.abs(dot(wo, n))
    n_dot_i = jnp.abs(dot(wi, n))
    i_dot_h = dot(wi, w_h)
    fd90 = 0.5 + 2.0 * mat.roughness * i_dot_h * i_dot_h
    fi = schlick_weight(n_dot_i)
    fo = schlick_weight(n_dot_o)
    w = lerp(1.0, fd90, fi) * lerp(1.0, fd90, fo)
    return mat.base_color * (INV_PI * w)[None, :]


def disney_sheen(mat, n, wo, wi):
    w_h = normalize(wi + wo, eps=1e-20)
    sheen_color = lerp(jnp.ones_like(mat.base_color), _tint(mat.base_color),
                       mat.sheen_tint[None, :])
    f = schlick_weight(dot(wi, w_h))
    return sheen_color * (f * mat.sheen)[None, :]


def disney_clear_coat(mat, n, wo, wi):
    w_h = normalize(wi + wo, eps=1e-20)
    alpha = lerp(0.1, 0.001, mat.clearcoat_gloss)
    d = gtr_1(dot(n, w_h), alpha)
    f = lerp(0.04, 1.0, schlick_weight(dot(wi, n)))
    g = smith_shadowing_ggx(dot(n, wi), 0.25) * smith_shadowing_ggx(dot(n, wo), 0.25)
    return 0.25 * mat.clearcoat * d * f * g


def _spec_color(mat):
    spec_base = lerp(jnp.ones_like(mat.base_color), _tint(mat.base_color),
                     mat.specular_tint[None, :])
    spec = (mat.specular * 0.08)[None, :] * spec_base
    return lerp(spec, mat.base_color, mat.metallic[None, :])


def disney_microfacet_isotropic(mat, n, wo, wi):
    w_h = normalize(wi + wo, eps=1e-20)
    spec = _spec_color(mat)
    alpha = jnp.maximum(0.001, mat.roughness * mat.roughness)
    d = gtr_2(dot(n, w_h), alpha)
    f = lerp(spec, jnp.ones_like(spec), schlick_weight(dot(wi, w_h))[None, :])
    g = smith_shadowing_ggx(dot(n, wi), alpha) * smith_shadowing_ggx(dot(n, wo), alpha)
    return f * (d * g)[None, :]


def _aniso_alphas(mat):
    aspect = jnp.sqrt(jnp.maximum(1.0 - mat.anisotropy * 0.9, 0.0))
    a = mat.roughness * mat.roughness
    return jnp.maximum(0.001, a / aspect), jnp.maximum(0.001, a * aspect)


def disney_microfacet_anisotropic(mat, n, wo, wi, tangent, bitangent):
    w_h = normalize(wi + wo, eps=1e-20)
    spec = _spec_color(mat)
    ax, ay = _aniso_alphas(mat)
    d = gtr_2_aniso(dot(n, w_h), jnp.abs(dot(w_h, tangent)),
                    jnp.abs(dot(w_h, bitangent)), ax, ay)
    f = lerp(spec, jnp.ones_like(spec), schlick_weight(dot(wi, w_h))[None, :])
    g = (smith_shadowing_ggx_aniso(dot(n, wi), jnp.abs(dot(wi, tangent)),
                                   jnp.abs(dot(wi, bitangent)), ax, ay)
         * smith_shadowing_ggx_aniso(dot(n, wo), jnp.abs(dot(wo, tangent)),
                                     jnp.abs(dot(wo, bitangent)), ax, ay))
    return f * (d * g)[None, :]


def disney_microfacet_transmission_isotropic(mat, n, wo, wi):
    o_dot_n = dot(wo, n)
    i_dot_n = dot(wi, n)
    degenerate = (o_dot_n == 0.0) | (i_dot_n == 0.0)
    entering = o_dot_n > 0.0
    eta_o = jnp.where(entering, 1.0, mat.ior)
    eta_i = jnp.where(entering, mat.ior, 1.0)
    w_h = normalize(wo + wi * (eta_i / eta_o)[None, :], eps=1e-20)

    alpha = jnp.maximum(0.001, mat.roughness * mat.roughness)
    d = gtr_2(jnp.abs(dot(n, w_h)), alpha)
    f = fresnel_dielectric(jnp.abs(dot(wi, n)), eta_o, eta_i)
    g = (smith_shadowing_ggx(jnp.abs(dot(n, wi)), alpha)
         * smith_shadowing_ggx(jnp.abs(dot(n, wo)), alpha))
    i_dot_h = dot(wi, w_h)
    o_dot_h = dot(wo, w_h)
    denom = (eta_o * o_dot_h + eta_i * i_dot_h) ** 2
    c = (jnp.abs(o_dot_h) / jnp.maximum(jnp.abs(o_dot_n), 1e-20)
         * jnp.abs(i_dot_h) / jnp.maximum(jnp.abs(i_dot_n), 1e-20)
         * (eta_o * eta_o) / jnp.maximum(denom, 1e-20))
    result = mat.base_color * (c * (1.0 - f) * g * d)[None, :]
    return jnp.where(degenerate[None, :], 0.0, result)


def disney_eval(mat, n, wo, wi, tangent, bitangent):
    """Full BRDF evaluation (disney_brdf.cuh:193-217)."""
    same = same_hemisphere(wo, wi, n)

    coat = disney_clear_coat(mat, n, wo, wi)
    sheen = disney_sheen(mat, n, wo, wi)
    diffuse = disney_diffuse(mat, n, wo, wi)
    gloss_iso = disney_microfacet_isotropic(mat, n, wo, wi)
    gloss_aniso = disney_microfacet_anisotropic(mat, n, wo, wi, tangent, bitangent)
    gloss = where3(mat.anisotropy == 0.0, gloss_iso, gloss_aniso)
    refl = ((diffuse + sheen)
            * ((1.0 - mat.metallic) * (1.0 - mat.specular_transmission))[None, :]
            + gloss + coat[None, :])

    spec_trans = disney_microfacet_transmission_isotropic(mat, n, wo, wi)
    trans = spec_trans * ((1.0 - mat.metallic) * mat.specular_transmission)[None, :]
    trans = where3(mat.specular_transmission > 0.0, trans, jnp.zeros_like(trans))

    return where3(same, refl, trans)


# ---------------------------------------------------------------------------
# Sampling helpers (disney_brdf.cuh:224-317)
# ---------------------------------------------------------------------------

def _frame_from_n(n):
    """up = |n.z| < 0.999 ? z : x; tangent = normalize(cross(up, n))."""
    use_z = jnp.abs(n[2]) < 0.999
    count = n.shape[1]
    up = where3(use_z, splat([0.0, 0.0, 1.0], count).astype(n.dtype),
                splat([1.0, 0.0, 0.0], count).astype(n.dtype))
    tangent = normalize(cross(up, n), eps=1e-20)
    bitangent = cross(n, tangent)
    return tangent, bitangent


def _local_to_world(tangent, bitangent, n, hx, hy, hz):
    return normalize(tangent * hx[None, :] + bitangent * hy[None, :]
                     + n * hz[None, :], eps=1e-20)


def sample_ggx(n, alpha, u1, u2):
    phi = TWO_PI * u1
    cos_theta = jnp.sqrt(jnp.maximum((1.0 - u2) / (1.0 + (alpha * alpha - 1.0) * u2), 0.0))
    sin_theta = 1.0 - cos_theta * cos_theta  # reference quirk (:227)
    tangent, bitangent = _frame_from_n(n)
    return _local_to_world(tangent, bitangent, n,
                           sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi),
                           cos_theta)


def sample_cosine_hemisphere(n, u1, u2):
    phi = TWO_PI * u1
    cos_theta = jnp.sqrt(u2)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - u2, 0.0))
    tangent, bitangent = _frame_from_n(n)
    return _local_to_world(tangent, bitangent, n,
                           sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi),
                           cos_theta)


def sample_gtr_1_h(n, tangent, bitangent, alpha, u1, u2):
    phi = TWO_PI * u1
    a2 = alpha * alpha
    cos2 = (1.0 - jnp.power(a2, 1.0 - u2)) / (1.0 - a2)
    cos_theta = jnp.sqrt(jnp.maximum(cos2, 0.0))
    sin_theta = 1.0 - cos2  # reference quirk (:266)
    return _local_to_world(tangent, bitangent, n,
                           sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi),
                           cos_theta)


def sample_gtr_2_aniso_h(n, tangent, bitangent, alpha_x, alpha_y, u1, u2):
    x = TWO_PI * u1
    s = jnp.sqrt(jnp.maximum(u2 / jnp.maximum(1.0 - u2, 1e-12), 0.0))
    w_h = (tangent * (alpha_x * jnp.cos(x) * s)[None, :]
           + bitangent * (alpha_y * jnp.sin(x) * s)[None, :] + n)
    return normalize(w_h, eps=1e-20)


def gtr_1_pdf(wo, wi, n, alpha):
    same = same_hemisphere(wo, wi, n)
    w_h = normalize(wi + wo, eps=1e-20)
    cos_theta_h = dot(n, w_h)
    d = gtr_1(cos_theta_h, alpha)
    pdf = d * cos_theta_h / (4.0 * dot(wo, w_h))
    return jnp.where(same, pdf, 0.0)


def gtr_2_aniso_pdf(wo, wi, n, tangent, bitangent, alpha_x, alpha_y):
    same = same_hemisphere(wo, wi, n)
    w_h = normalize(wi + wo, eps=1e-20)
    cos_theta_h = jnp.abs(dot(n, w_h))
    d = gtr_2_aniso(cos_theta_h, jnp.abs(dot(w_h, tangent)),
                    jnp.abs(dot(w_h, bitangent)), alpha_x, alpha_y)
    pdf = d * cos_theta_h / (4.0 * jnp.abs(dot(wo, w_h)))
    return jnp.where(same, pdf, 0.0)


def build_tangent_space(normal):
    """NBVH ortho_basis used by the bounce sampler
    (cuda_renderer_neural.cu:174-190)."""
    nx, ny = normal[0], normal[1]
    use_x = (nx < 0.6) & (nx > -0.6)
    use_y = ~use_x & (ny < 0.6) & (ny > -0.6)
    use_z = ~use_x & ~use_y
    b = jnp.stack([use_x, use_y, use_z], axis=0).astype(normal.dtype)
    tangent = normalize(cross(b, normal), eps=1e-20)
    bitangent = normalize(cross(normal, tangent), eps=1e-20)
    return tangent, bitangent


# ---------------------------------------------------------------------------
# 3-component sampler + mixture PDF (disney_brdf.cuh:395-508)
# ---------------------------------------------------------------------------

def disney_pdf_3component(mat, n, wo, wi, tangent, bitangent):
    same = same_hemisphere(wo, wi, n)

    alpha = jnp.maximum(0.001, mat.roughness * mat.roughness)
    ax, ay = _aniso_alphas(mat)
    cc_alpha = lerp(0.1, 0.001, mat.clearcoat_gloss)

    n_dot_i = jnp.maximum(0.0, dot(n, wi))
    pdf_diffuse = n_dot_i * INV_PI

    # Specular: raw (unclamped) n·h and h·o, matching NBVH (:495-498).
    w_h = normalize(wi + wo, eps=1e-20)
    n_dot_h = dot(n, w_h)
    h_dot_o = dot(w_h, wo)
    d_iso = gtr_2(n_dot_h, alpha)
    pdf_spec_iso = d_iso * n_dot_h / (4.0 * h_dot_o)
    pdf_spec_aniso = gtr_2_aniso_pdf(wo, wi, n, tangent, bitangent, ax, ay)
    pdf_specular = jnp.where(mat.anisotropy == 0.0, pdf_spec_iso, pdf_spec_aniso)

    pdf_clearcoat = gtr_1_pdf(wo, wi, n, cc_alpha)

    pdf = (pdf_diffuse + pdf_specular + pdf_clearcoat) / 3.0
    return jnp.where(same, pdf, 0.0)


def disney_sample_3component(mat, n, wo, tangent, bitangent, u1, u2, u3):
    """Uniform 3-way lobe pick (diffuse/specular/clearcoat) with mixture PDF.

    Returns (wi [3, N], pdf [N]); pdf == 0 marks invalid samples (full
    transmission materials or below-hemisphere specular reflections), exactly
    like the reference's early-outs (:408-411, :441-444, :452-456).
    """
    component = jnp.minimum((u3 * 3.0).astype(jnp.int32), 2)

    wi_diffuse = sample_cosine_hemisphere(n, u1, u2)

    alpha = jnp.maximum(0.001, mat.roughness * mat.roughness)
    ax, ay = _aniso_alphas(mat)
    h_iso = sample_ggx(n, alpha, u1, u2)
    h_aniso = sample_gtr_2_aniso_h(n, tangent, bitangent, ax, ay, u1, u2)
    w_h_spec = where3(mat.anisotropy == 0.0, h_iso, h_aniso)
    wi_specular = reflect(-wo, w_h_spec)

    cc_alpha = lerp(0.1, 0.001, mat.clearcoat_gloss)
    w_h_cc = sample_gtr_1_h(n, tangent, bitangent, cc_alpha, u1, u2)
    wi_clearcoat = reflect(-wo, w_h_cc)

    wi = where3(component == 0, wi_diffuse,
                where3(component == 1, wi_specular, wi_clearcoat))

    valid = jnp.where(component == 0, True, same_hemisphere(wo, wi, n))
    valid &= mat.specular_transmission < 1.0

    pdf = disney_pdf_3component(mat, n, wo, wi, tangent, bitangent)
    pdf = jnp.where(valid, pdf, 0.0)
    return wi, pdf


# ---------------------------------------------------------------------------
# Legacy 2-lobe sampler (disney_brdf.cuh:320-383, 511-540) — kept for API
# parity; the production pipeline uses the 3-component variant.
# ---------------------------------------------------------------------------

def _lobe_weights(mat):
    diffuse_weight = (1.0 - mat.metallic) * (1.0 - mat.specular_transmission)
    f0 = 0.08 * mat.specular
    specular_weight = f0 + (1.0 - f0) * mat.metallic
    total = diffuse_weight + specular_weight
    return diffuse_weight / jnp.maximum(total, 1e-20)


def disney_pdf(mat, n, wo, wi):
    same = same_hemisphere(wo, wi, n)
    diffuse_prob = _lobe_weights(mat)
    n_dot_i = jnp.maximum(0.0, dot(n, wi))
    pdf_diffuse = n_dot_i * INV_PI
    h = normalize(wi + wo, eps=1e-20)
    n_dot_h = jnp.maximum(0.0, dot(n, h))
    h_dot_o = jnp.maximum(1e-4, dot(h, wo))
    alpha = jnp.maximum(0.001, mat.roughness * mat.roughness)
    d = gtr_2(n_dot_h, alpha)
    pdf_specular = d * n_dot_h / (4.0 * h_dot_o)
    pdf = pdf_diffuse * diffuse_prob + pdf_specular * (1.0 - diffuse_prob)
    return jnp.where(same, pdf, 0.0)


def disney_sample(mat, n, wo, u1, u2, u3):
    diffuse_prob = _lobe_weights(mat)
    pick_diffuse = u3 < diffuse_prob

    wi_d = sample_cosine_hemisphere(n, u1, u2)
    alpha = jnp.maximum(0.001, mat.roughness * mat.roughness)
    h = sample_ggx(n, alpha, u1, u2)
    wi_s = normalize(-wo + h * (2.0 * dot(wo, h))[None, :], eps=1e-20)
    wi = where3(pick_diffuse, wi_d, wi_s)

    valid = pick_diffuse | (dot(wi, n) > 0.0)

    n_dot_i = jnp.maximum(0.0, dot(n, wi))
    pdf_diffuse = n_dot_i * INV_PI
    hh = normalize(wi + wo, eps=1e-20)
    n_dot_h = jnp.maximum(0.0, dot(n, hh))
    h_dot_o = jnp.maximum(1e-4, dot(hh, wo))
    d = gtr_2(n_dot_h, alpha)
    pdf_specular = d * n_dot_h / (4.0 * h_dot_o)
    pdf = pdf_diffuse * diffuse_prob + pdf_specular * (1.0 - diffuse_prob)
    pdf = jnp.where(valid, pdf, 0.0)
    return wi, pdf
