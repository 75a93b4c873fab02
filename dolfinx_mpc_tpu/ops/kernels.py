"""Element-tensor kernels: trace an integrand once, vectorize over
(cells x quadrature x basis pairs).

TPU-native replacement for FFCx-generated `tabulate_tensor` kernels invoked in
the reference's hot loops (/root/reference/cpp/assemble_matrix.cpp:504-506,
cpp/assemble_vector.cpp:76-84).  All control flow is static; the batched cell
dimension is the XLA-parallel axis; contractions land on the MXU.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.cells import get_cell
from ..fem.elements import lagrange_element
from ..fem.forms import Arg, Ctx, FormTerm
from ..fem.functionspace import FunctionSpace
from ..fem.geometry_maps import (
    facet_reference_points,
    facet_tangent_matrix,
    geom_tabulation,
    reference_facet_normals,
)
from ..fem.mesh import Mesh
from ..fem.quadrature import quadrature_rule
from .smallmat import small_det, small_inv

__all__ = ["CompiledTerm", "compile_term"]


def _basis_args(phi, dphi_phys, bs):
    """Unrolled basis Arg arrays at all qps.

    phi: (nq, nd) traced or static; dphi_phys: (nq, nd, gdim) traced.
    Returns (values, gradients):
      bs == 1: values (nq, nd), gradients (nq, nd, gdim)
      bs > 1:  values (nq, nd*bs, bs), gradients (nq, nd*bs, bs, gdim)
    """
    if bs == 1:
        return phi, dphi_phys
    nq, nd = phi.shape
    eye = jnp.eye(bs, dtype=phi.dtype)
    vals = jnp.einsum("qi,kb->qikb", phi, eye).reshape(nq, nd * bs, bs)
    grads = jnp.einsum("qig,kb->qikbg", dphi_phys, eye).reshape(nq, nd * bs, bs, dphi_phys.shape[-1])
    return vals, grads


def _coeff_args(phi_w, dphi_w_phys, wlocal, bs):
    """Coefficient value/gradient at all qps from local dof values.

    wlocal: (nd_w*bs,) interleaved.  Returns Arg arrays over q."""
    nd = phi_w.shape[1]
    wl = wlocal.reshape(nd, bs)
    vals = jnp.einsum("qi,ib->qb", phi_w, wl)
    grads = jnp.einsum("qig,ib->qbg", dphi_w_phys, wl)
    if bs == 1:
        return vals[:, 0], grads[:, 0, :]
    return vals, grads


@dataclass
class CompiledTerm:
    """A single integral term compiled to a batched element-tensor function.

    kernel(coords, lf, wlocals) -> Ae:
      coords: (n_ent, n_verts, gdim)
      lf: (n_ent,) local facet index (facet integrals; ignored for cells)
      wlocals: dict name -> (n_ent, nd_w*bs_w) local coefficient values
      Ae: (n_ent, ndt[, nds]) element tensors (already includes quadrature
      weights and |detJ| / surface measure).
    """

    term: FormTerm
    mesh: Mesh
    entities: np.ndarray  # active cells (cell integral) or facets
    cells: np.ndarray  # cell index per active entity
    local_facets: Optional[np.ndarray]  # per active entity (facet integrals)
    kernel: Callable
    coeff_names: tuple
    coeff_spaces: tuple


def compile_term(term: FormTerm, V_test: FunctionSpace, V_trial: Optional[FunctionSpace]) -> CompiledTerm:
    mesh = V_test.mesh
    cell = mesh.ref_cell
    rank = 2 if V_trial is not None else 1
    deg_t = V_test.element.degree
    deg_s = V_trial.element.degree if V_trial is not None else deg_t
    qdeg = term.quad_degree
    if qdeg is None:
        qdeg = deg_t + deg_s + max(deg_t, deg_s)  # headroom for coefficients/coords
    coeff_names = tuple(term.coefficients.keys())
    coeff_spaces = tuple(term.coefficients[n].function_space for n in coeff_names)
    constants = {k: jnp.asarray(v) for k, v in term.constants.items()}

    if term.integral == "cell":
        entities = (
            np.arange(mesh.num_cells, dtype=np.int32)
            if term.entities is None
            else np.asarray(term.entities, dtype=np.int32)
        )
        cells = entities
        q, w = quadrature_rule(cell, qdeg)
        kernel = _make_cell_kernel(
            mesh, V_test, V_trial, term.integrand, q, w, coeff_names, coeff_spaces, constants, rank
        )
        return CompiledTerm(term, mesh, entities, cells, None, kernel, coeff_names, coeff_spaces)

    if term.integral == "exterior_facet":
        facets = (
            mesh.exterior_facets() if term.entities is None else np.asarray(term.entities, dtype=np.int32)
        )
        _, cell_to_f, f2c = mesh.facets()
        cells = f2c[facets, 0]
        # local facet index of each facet within its cell
        lf = np.argmax(cell_to_f[cells] == facets[:, None], axis=1).astype(np.int32)
        kernel = _make_facet_kernel(
            mesh, V_test, V_trial, term.integrand, qdeg, coeff_names, coeff_spaces, constants, rank
        )
        return CompiledTerm(term, mesh, facets, cells.astype(np.int32), lf, kernel, coeff_names, coeff_spaces)

    raise ValueError(f"unsupported integral type {term.integral}")


def _make_cell_kernel(mesh, V_test, V_trial, integrand, q, w, coeff_names, coeff_spaces, constants, rank):
    cell_type = mesh.cell_type
    phi_g, dphi_g = geom_tabulation(cell_type, q)  # (nq, nv), (nq, nv, tdim)
    el_t = V_test.element
    phi_t, dphi_t = el_t.tabulate(q), el_t.tabulate_grad(q)
    bs_t = V_test.block_size
    if rank == 2:
        el_s = V_trial.element
        phi_s, dphi_s = el_s.tabulate(q), el_s.tabulate_grad(q)
        bs_s = V_trial.block_size
    tabs_w = [
        (W.element.tabulate(q), W.element.tabulate_grad(q), W.block_size) for W in coeff_spaces
    ]
    wq = jnp.asarray(w)

    def kernel_one(coords, lf_unused, wlocals):
        J = jnp.einsum("qvt,vg->qgt", jnp.asarray(dphi_g), coords)  # (nq, gdim, tdim)
        detJ = small_det(J)
        Jinv = small_inv(J)  # (nq, tdim, gdim)
        xq = jnp.asarray(phi_g) @ coords  # (nq, gdim)
        scale = wq * jnp.abs(detJ)

        dphi_t_p = jnp.einsum("qit,qtg->qig", jnp.asarray(dphi_t), Jinv)
        tv, tg = _basis_args(jnp.asarray(phi_t), dphi_t_p, bs_t)
        wargs = {}
        for name, (pw, dw, bsw) in zip(coeff_names, tabs_w):
            dwp = jnp.einsum("qit,qtg->qig", jnp.asarray(dw), Jinv)
            wargs[name] = _coeff_args(jnp.asarray(pw), dwp, wlocals[name], bsw)

        if rank == 1:

            def at_q(tv_q, tg_q, x_q, w_q):
                ctx = Ctx(x_q, None, {**{n: Arg(*a) for n, a in w_q.items()}, **constants})
                return jax.vmap(lambda v, g: integrand(Arg(v, g), ctx))(tv_q, tg_q)

            vals = jax.vmap(at_q)(tv, tg, xq, {n: (a[0], a[1]) for n, a in wargs.items()})
            return jnp.einsum("q,qi->i", scale.astype(vals.dtype), vals)

        dphi_s_p = jnp.einsum("qit,qtg->qig", jnp.asarray(dphi_s), Jinv)
        sv, sg = _basis_args(jnp.asarray(phi_s), dphi_s_p, bs_s)

        def at_q(tv_q, tg_q, sv_q, sg_q, x_q, w_q):
            ctx = Ctx(x_q, None, {**{n: Arg(*a) for n, a in w_q.items()}, **constants})

            def row(vval, vgrad):  # one test function
                return jax.vmap(lambda uval, ugrad: integrand(Arg(uval, ugrad), Arg(vval, vgrad), ctx))(
                    sv_q, sg_q
                )

            return jax.vmap(row)(tv_q, tg_q)  # (ndt, nds)

        vals = jax.vmap(at_q)(tv, tg, sv, sg, xq, {n: (a[0], a[1]) for n, a in wargs.items()})
        return jnp.einsum("q,qij->ij", scale.astype(vals.dtype), vals)

    def kernel(coords_b, lf_b, wlocals_b):
        return jax.vmap(lambda c, l, w_: kernel_one(c, l, w_))(coords_b, lf_b, wlocals_b)

    return kernel


def _make_facet_kernel(mesh, V_test, V_trial, integrand, qdeg, coeff_names, coeff_spaces, constants, rank):
    cell_type = mesh.cell_type
    cell = mesh.ref_cell
    fcell = cell.facet_cell
    qf, wf = quadrature_rule(fcell, qdeg)
    n_lf = len(cell.facets)
    # per-local-facet tabulations at the facet quadrature points mapped into
    # the cell reference coordinates
    phi_g_all, dphi_g_all, phi_t_all, dphi_t_all = [], [], [], []
    phi_s_all, dphi_s_all = [], []
    tabs_w_all = [[] for _ in coeff_spaces]
    ref_normals = reference_facet_normals(cell_type)  # (n_lf, tdim)
    embed = []
    el_t = V_test.element
    el_s = V_trial.element if V_trial is not None else None
    for lf in range(n_lf):
        Xq = facet_reference_points(cell_type, lf, qf)
        pg, dg = geom_tabulation(cell_type, Xq)
        phi_g_all.append(pg)
        dphi_g_all.append(dg)
        phi_t_all.append(el_t.tabulate(Xq))
        dphi_t_all.append(el_t.tabulate_grad(Xq))
        if el_s is not None:
            phi_s_all.append(el_s.tabulate(Xq))
            dphi_s_all.append(el_s.tabulate_grad(Xq))
        for i, W in enumerate(coeff_spaces):
            tabs_w_all[i].append((W.element.tabulate(Xq), W.element.tabulate_grad(Xq)))
        T = facet_tangent_matrix(cell_type, lf)
        embed.append(np.sqrt(np.linalg.det(T.T @ T)) if T.size else 1.0)

    phi_g_all = jnp.asarray(np.stack(phi_g_all))  # (n_lf, nq, nv)
    dphi_g_all = jnp.asarray(np.stack(dphi_g_all))
    phi_t_all = jnp.asarray(np.stack(phi_t_all))
    dphi_t_all = jnp.asarray(np.stack(dphi_t_all))
    if el_s is not None:
        phi_s_all = jnp.asarray(np.stack(phi_s_all))
        dphi_s_all = jnp.asarray(np.stack(dphi_s_all))
    tabs_w_dev = [
        (jnp.asarray(np.stack([t[0] for t in tw])), jnp.asarray(np.stack([t[1] for t in tw])))
        for tw in tabs_w_all
    ]
    ref_normals = jnp.asarray(ref_normals)
    embed = jnp.asarray(embed)
    wfq = jnp.asarray(wf)
    bs_t = V_test.block_size
    bs_s = V_trial.block_size if V_trial is not None else 1
    bsw = [W.block_size for W in coeff_spaces]

    def kernel_one(coords, lf, wlocals):
        pg = phi_g_all[lf]
        dg = dphi_g_all[lf]
        pt, dt = phi_t_all[lf], dphi_t_all[lf]
        J = jnp.einsum("qvt,vg->qgt", dg, coords)
        detJ = small_det(J)
        Jinv = small_inv(J)
        xq = pg @ coords
        # Nanson: n ds = detJ J^{-T} N dS_ref; measure includes the embedding
        nref = ref_normals[lf]
        nvec = jnp.einsum("qtg,t->qg", Jinv, nref)  # J^{-T} N
        nnorm = jnp.linalg.norm(nvec, axis=1)
        normal = nvec / nnorm[:, None] * jnp.sign(detJ)[:, None]
        scale = wfq * jnp.abs(detJ) * nnorm * embed[lf]

        dphi_t_p = jnp.einsum("qit,qtg->qig", dt, Jinv)
        tv, tg = _basis_args(pt, dphi_t_p, bs_t)
        wargs = {}
        for name, (pw_all, dw_all), bw in zip(coeff_names, tabs_w_dev, bsw):
            dwp = jnp.einsum("qit,qtg->qig", dw_all[lf], Jinv)
            wargs[name] = _coeff_args(pw_all[lf], dwp, wlocals[name], bw)

        if rank == 1:

            def at_q(tv_q, tg_q, x_q, n_q, w_q):
                ctx = Ctx(x_q, n_q, {**{n: Arg(*a) for n, a in w_q.items()}, **constants})
                return jax.vmap(lambda v, g: integrand(Arg(v, g), ctx))(tv_q, tg_q)

            vals = jax.vmap(at_q)(tv, tg, xq, normal, {n: (a[0], a[1]) for n, a in wargs.items()})
            return jnp.einsum("q,qi->i", scale.astype(vals.dtype), vals)

        ps, ds_ = phi_s_all[lf], dphi_s_all[lf]
        dphi_s_p = jnp.einsum("qit,qtg->qig", ds_, Jinv)
        sv, sg = _basis_args(ps, dphi_s_p, bs_s)

        def at_q(tv_q, tg_q, sv_q, sg_q, x_q, n_q, w_q):
            ctx = Ctx(x_q, n_q, {**{n: Arg(*a) for n, a in w_q.items()}, **constants})

            def row(vval, vgrad):
                return jax.vmap(lambda uval, ugrad: integrand(Arg(uval, ugrad), Arg(vval, vgrad), ctx))(
                    sv_q, sg_q
                )

            return jax.vmap(row)(tv_q, tg_q)

        vals = jax.vmap(at_q)(tv, tg, sv, sg, xq, normal, {n: (a[0], a[1]) for n, a in wargs.items()})
        return jnp.einsum("q,qij->ij", scale.astype(vals.dtype), vals)

    def kernel(coords_b, lf_b, wlocals_b):
        return jax.vmap(kernel_one)(coords_b, lf_b, wlocals_b)

    return kernel
