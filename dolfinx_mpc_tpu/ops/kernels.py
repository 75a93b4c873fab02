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


# ---- mixed-space support ---------------------------------------------------
# A mixed space (fem/mixed.py) is handled as a list of fields; each local
# basis function belongs to one field, its Arg for that field is the usual
# value/gradient and ZERO for the others.  The integrand then receives a
# tuple of per-field Args — e.g. Stokes:
#   lambda (u, p), (v, q), c: inner(grad(u), grad(v)) - p*div(v) - q*div(u)
# For ordinary spaces the field list has length 1 and a bare Arg is passed,
# preserving the existing integrand convention.


def _side_fields(V):
    """[(element, bs, slot_start)], total unrolled dofs, is_mixed."""
    if getattr(V, "is_mixed", False):
        out, s = [], 0
        for W in V.spaces:
            out.append((W.element, W.block_size, s))
            s += W.element.ndofs * W.block_size
        return out, s, True
    return [(V.element, V.block_size, 0)], V.element.ndofs * V.block_size, False


def _field_tabs(fields, q):
    return [(el.tabulate(q), el.tabulate_grad(q), bs, s0) for el, bs, s0 in fields]


def _field_basis_args(tabs, Jinv, ND):
    """Per-field (values, grads) arrays padded with zeros to ND local-dof
    rows at the field's slot range.  Returns a tuple of (vals, grads)."""
    rdt = Jinv.dtype
    res = []
    for phi, dphi, bs, s0 in tabs:
        dphi_p = jnp.einsum("qit,qtg->qig", jnp.asarray(dphi, rdt), Jinv)
        v, g = _basis_args(jnp.asarray(phi, rdt), dphi_p, bs)
        w = v.shape[1]
        if w != ND or s0 != 0:
            nq = v.shape[0]
            v = jnp.zeros((nq, ND) + v.shape[2:], v.dtype).at[:, s0 : s0 + w].set(v)
            g = jnp.zeros((nq, ND) + g.shape[2:], g.dtype).at[:, s0 : s0 + w].set(g)
        res.append((v, g))
    return tuple(res)


def _mk_arg(mixed):
    """Pytree-of-(v,g) -> integrand argument (tuple of Args or bare Arg)."""
    if mixed:
        return lambda t: tuple(Arg(v, g) for v, g in t)
    return lambda t: Arg(*t[0])


def _coeff_field_args(tabs, Jinv, wlocal, mixed):
    """Coefficient Args over q; tuple-of-Args pairs for mixed coefficient
    spaces (tabs as from _field_tabs on the coefficient space's fields)."""
    rdt = Jinv.dtype
    parts = []
    for phi, dphi, bs, s0 in tabs:
        dwp = jnp.einsum("qit,qtg->qig", jnp.asarray(dphi, rdt), Jinv)
        nd = phi.shape[1]
        parts.append(_coeff_args(jnp.asarray(phi, rdt), dwp, wlocal[s0 : s0 + nd * bs], bs))
    return tuple(parts) if mixed else parts[0]


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
    fields_t, ND_t, mixed_t = _side_fields(V_test)
    tabs_t = _field_tabs(fields_t, q)
    mk_t = _mk_arg(mixed_t)
    if rank == 2:
        fields_s, ND_s, mixed_s = _side_fields(V_trial)
        tabs_s = _field_tabs(fields_s, q)
        mk_s = _mk_arg(mixed_s)
    tabs_w, wmixed = [], {}
    for name, W in zip(coeff_names, coeff_spaces):
        fw, _, wmx = _side_fields(W)
        tabs_w.append(_field_tabs(fw, q))
        wmixed[name] = wmx
    wq = jnp.asarray(w)

    def kernel_one(coords, lf_unused, wlocals):
        rdt = coords.dtype
        J = jnp.einsum("qvt,vg->qgt", jnp.asarray(dphi_g, rdt), coords)  # (nq, gdim, tdim)
        detJ = small_det(J)
        Jinv = small_inv(J)  # (nq, tdim, gdim)
        xq = jnp.asarray(phi_g, rdt) @ coords  # (nq, gdim)
        scale = wq.astype(rdt) * jnp.abs(detJ)

        targs = _field_basis_args(tabs_t, Jinv, ND_t)
        wargs = {}
        for name, tw in zip(coeff_names, tabs_w):
            wargs[name] = _coeff_field_args(tw, Jinv, wlocals[name], wmixed[name])

        def ctx_at(x_q, w_q):
            wdict = {}
            for n, a in w_q.items():
                wdict[n] = tuple(Arg(*p) for p in a) if wmixed[n] else Arg(*a)
            return Ctx(x_q, None, {**wdict, **constants})

        if rank == 1:

            def at_q(t_q, x_q, w_q):
                ctx = ctx_at(x_q, w_q)
                return jax.vmap(lambda vt: integrand(mk_t(vt), ctx))(t_q)

            vals = jax.vmap(at_q)(targs, xq, wargs)
            return jnp.einsum("q,qi->i", scale.astype(vals.dtype), vals)

        sargs = _field_basis_args(tabs_s, Jinv, ND_s)

        def at_q(t_q, s_q, x_q, w_q):
            ctx = ctx_at(x_q, w_q)

            def row(vt):  # one test function (pytree of per-field (v, g))
                return jax.vmap(lambda ut: integrand(mk_s(ut), mk_t(vt), ctx))(s_q)

            return jax.vmap(row)(t_q)  # (ndt, nds)

        vals = jax.vmap(at_q)(targs, sargs, xq, wargs)
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
    fields_t, ND_t, mixed_t = _side_fields(V_test)
    mk_t = _mk_arg(mixed_t)
    if rank == 2:
        fields_s, ND_s, mixed_s = _side_fields(V_trial)
        mk_s = _mk_arg(mixed_s)
    fields_w, wmixed = [], {}
    for name, W in zip(coeff_names, coeff_spaces):
        fw, _, wmx = _side_fields(W)
        fields_w.append(fw)
        wmixed[name] = wmx

    # per-local-facet tabulations at the facet quadrature points mapped into
    # the cell reference coordinates; stacked over the local-facet axis
    def stack_tabs(fields):
        # [(phi (n_lf, nq, nd), dphi (n_lf, nq, nd, tdim), bs, s0)] per field
        out = []
        for el, bs, s0 in fields:
            ps, ds = [], []
            for lf in range(n_lf):
                Xq = facet_reference_points(cell_type, lf, qf)
                ps.append(el.tabulate(Xq))
                ds.append(el.tabulate_grad(Xq))
            out.append((jnp.asarray(np.stack(ps)), jnp.asarray(np.stack(ds)), bs, s0))
        return out

    phi_g_all, dphi_g_all, embed = [], [], []
    for lf in range(n_lf):
        Xq = facet_reference_points(cell_type, lf, qf)
        pg, dg = geom_tabulation(cell_type, Xq)
        phi_g_all.append(pg)
        dphi_g_all.append(dg)
        T = facet_tangent_matrix(cell_type, lf)
        embed.append(np.sqrt(np.linalg.det(T.T @ T)) if T.size else 1.0)
    phi_g_all = jnp.asarray(np.stack(phi_g_all))  # (n_lf, nq, nv)
    dphi_g_all = jnp.asarray(np.stack(dphi_g_all))
    tabs_t_all = stack_tabs(fields_t)
    tabs_s_all = stack_tabs(fields_s) if rank == 2 else None
    tabs_w_all = [stack_tabs(fw) for fw in fields_w]
    ref_normals = jnp.asarray(reference_facet_normals(cell_type))  # (n_lf, tdim)
    embed = jnp.asarray(embed)
    wfq = jnp.asarray(wf)

    def kernel_one(coords, lf, wlocals):
        rdt = coords.dtype
        pg = phi_g_all[lf].astype(rdt)
        dg = dphi_g_all[lf].astype(rdt)
        J = jnp.einsum("qvt,vg->qgt", dg, coords)
        detJ = small_det(J)
        Jinv = small_inv(J)
        xq = pg @ coords
        # Nanson: n ds = detJ J^{-T} N dS_ref; measure includes the embedding
        nref = ref_normals[lf]
        nvec = jnp.einsum("qtg,t->qg", Jinv, nref.astype(rdt))  # J^{-T} N
        nnorm = jnp.linalg.norm(nvec, axis=1)
        normal = nvec / nnorm[:, None] * jnp.sign(detJ)[:, None]
        scale = wfq.astype(rdt) * jnp.abs(detJ) * nnorm * embed[lf].astype(rdt)

        at_lf = lambda tabs: [(p[lf], d[lf], bs, s0) for p, d, bs, s0 in tabs]
        targs = _field_basis_args(at_lf(tabs_t_all), Jinv, ND_t)
        wargs = {}
        for name, tw in zip(coeff_names, tabs_w_all):
            wargs[name] = _coeff_field_args(at_lf(tw), Jinv, wlocals[name], wmixed[name])

        def ctx_at(x_q, n_q, w_q):
            wdict = {}
            for n, a in w_q.items():
                wdict[n] = tuple(Arg(*p) for p in a) if wmixed[n] else Arg(*a)
            return Ctx(x_q, n_q, {**wdict, **constants})

        if rank == 1:

            def at_q(t_q, x_q, n_q, w_q):
                ctx = ctx_at(x_q, n_q, w_q)
                return jax.vmap(lambda vt: integrand(mk_t(vt), ctx))(t_q)

            vals = jax.vmap(at_q)(targs, xq, normal, wargs)
            return jnp.einsum("q,qi->i", scale.astype(vals.dtype), vals)

        sargs = _field_basis_args(at_lf(tabs_s_all), Jinv, ND_s)

        def at_q(t_q, s_q, x_q, n_q, w_q):
            ctx = ctx_at(x_q, n_q, w_q)

            def row(vt):
                return jax.vmap(lambda ut: integrand(mk_s(ut), mk_t(vt), ctx))(s_q)

            return jax.vmap(row)(t_q)

        vals = jax.vmap(at_q)(targs, sargs, xq, normal, wargs)
        return jnp.einsum("q,qij->ij", scale.astype(vals.dtype), vals)

    def kernel(coords_b, lf_b, wlocals_b):
        return jax.vmap(kernel_one)(coords_b, lf_b, wlocals_b)

    return kernel
