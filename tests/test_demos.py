"""Demos as integration tests (the reference CI executes its demos too,
test_mpc.yml:121-196).  Each demo self-verifies (oracle / physics checks)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def test_demo_periodic_geometrical():
    from demos.demo_periodic_geometrical import main

    main(n=12)


def test_demo_elasticity():
    from demos.demo_elasticity import main

    main(n=8)


def test_demo_contact_3d():
    from demos.demo_contact_3D import main

    main(nb=3, nt=2)


def test_demo_wave():
    from demos.demo_linear_wave_problem import main

    main(n=12, steps=10)
