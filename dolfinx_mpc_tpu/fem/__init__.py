"""Mini-FEM substrate replacing the DOLFINx surface the reference consumes
(SURVEY.md §1 L0): meshes, Lagrange spaces, quadrature, UFL-lite forms,
geometry maps."""

from .forms import BilinearForm, Form, LinearForm, derivative
from .functionspace import (
    DirichletBC,
    Function,
    FunctionSpace,
    dirichletbc,
    functionspace,
    locate_dofs_geometrical,
    locate_dofs_topological,
)
from .mesh import (
    Mesh,
    MeshTags,
    create_box,
    create_rectangle,
    create_unit_cube,
    create_unit_interval,
    create_unit_square,
    locate_entities,
    locate_entities_boundary,
    meshtags,
)
