"""C API test: build libipopt_tpu_c.so + the hs071 C example and run it —
the same gate as the reference's make test (exit 0 + "EXIT: Optimal Solution
Found.", test/run_unitTests.in:33-41)."""
import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUILD = os.path.join(ROOT, "native", "build")


@pytest.mark.skipif(shutil.which("cmake") is None or shutil.which("ninja") is None,
                    reason="cmake/ninja not available")
def test_hs071_through_c_api():
    os.makedirs(BUILD, exist_ok=True)
    subprocess.run(["cmake", "-G", "Ninja", ".."], cwd=BUILD, check=True,
                   capture_output=True)
    subprocess.run(["ninja"], cwd=BUILD, check=True, capture_output=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run([os.path.join(BUILD, "hs071_c")], env=env,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert "EXIT: Optimal Solution Found." in out.stdout


@pytest.mark.skipif(shutil.which("cmake") is None or shutil.which("ninja") is None,
                    reason="cmake/ninja not available")
def test_hs071_through_fortran_api():
    """Drive the Fortran-convention entry points (IPCREATE/IPSOLVE/...,
    IpStdFInterface.c parity): all arguments by reference, callbacks with
    IERR out-params, column-major dense Jacobian, trailing-blank-padded
    option strings with hidden length arguments."""
    import ctypes as ct

    os.makedirs(BUILD, exist_ok=True)
    subprocess.run(["cmake", "-G", "Ninja", ".."], cwd=BUILD, check=True,
                   capture_output=True)
    subprocess.run(["ninja"], cwd=BUILD, check=True, capture_output=True)
    # The embedded CPython in libipopt_tpu_c needs the repo on sys.path.
    env_path = ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")
    os.environ["PYTHONPATH"] = env_path

    lib = ct.CDLL(os.path.join(BUILD, "libipopt_tpu_c.so"))
    ipindex, ipnumber = ct.c_int, ct.c_double
    P = ct.POINTER

    F_CB = ct.CFUNCTYPE(None, P(ipindex), P(ipnumber), P(ipnumber),
                        P(ipindex), P(ipnumber), P(ipindex))
    G_CB = ct.CFUNCTYPE(None, P(ipindex), P(ipnumber), P(ipindex),
                        P(ipnumber), P(ipindex), P(ipnumber), P(ipindex))
    GF_CB = ct.CFUNCTYPE(None, P(ipindex), P(ipnumber), P(ipnumber),
                         P(ipindex), P(ipnumber), P(ipindex))
    JG_CB = ct.CFUNCTYPE(None, P(ipindex), P(ipnumber), P(ipindex),
                         P(ipnumber), P(ipindex), P(ipnumber), P(ipindex))

    @F_CB
    def eval_f(N, X, OBJ, IDAT, DDAT, IERR):
        x = [X[i] for i in range(4)]
        OBJ[0] = x[0] * x[3] * (x[0] + x[1] + x[2]) + x[2]
        IERR[0] = 0

    @G_CB
    def eval_g(N, X, M, G, IDAT, DDAT, IERR):
        x = [X[i] for i in range(4)]
        G[0] = x[0] * x[1] * x[2] * x[3]
        G[1] = x[0] ** 2 + x[1] ** 2 + x[2] ** 2 + x[3] ** 2
        IERR[0] = 0

    @GF_CB
    def eval_grad_f(N, X, GRAD, IDAT, DDAT, IERR):
        x = [X[i] for i in range(4)]
        GRAD[0] = x[3] * (2 * x[0] + x[1] + x[2])
        GRAD[1] = x[0] * x[3]
        GRAD[2] = x[0] * x[3] + 1.0
        GRAD[3] = x[0] * (x[0] + x[1] + x[2])
        IERR[0] = 0

    @JG_CB
    def eval_jac_g(N, X, M, JAC, IDAT, DDAT, IERR):
        x = [X[i] for i in range(4)]
        m = 2
        # column-major JAC(M,N): JAC[i + j*m] = d g_i / d x_j
        dg = [[x[1] * x[2] * x[3], x[0] * x[2] * x[3],
               x[0] * x[1] * x[3], x[0] * x[1] * x[2]],
              [2 * x[0], 2 * x[1], 2 * x[2], 2 * x[3]]]
        for i in range(2):
            for j in range(4):
                JAC[i + j * m] = dg[i][j]
        IERR[0] = 0

    lib.ipcreate_.restype = ct.c_void_p
    n, m = ipindex(4), ipindex(2)
    x_L = (ipnumber * 4)(1.0, 1.0, 1.0, 1.0)
    x_U = (ipnumber * 4)(5.0, 5.0, 5.0, 5.0)
    g_L = (ipnumber * 2)(25.0, 40.0)
    g_U = (ipnumber * 2)(2e19, 40.0)
    prob = lib.ipcreate_(ct.byref(n), x_L, x_U, ct.byref(m), g_L, g_U,
                         eval_f, eval_g, eval_grad_f, eval_jac_g)
    assert prob

    fp = ct.c_void_p(prob)
    tol = ipnumber(1e-8)
    # Fortran strings: blank-padded with hidden length arguments.
    assert lib.ipaddnumoption_(ct.byref(fp), b"tol   ", ct.byref(tol),
                               ct.c_int(6)) == 0
    pl = ipindex(0)
    assert lib.ipaddintoption_(ct.byref(fp), b"print_level",
                               ct.byref(pl), ct.c_int(11)) == 0
    assert lib.ipaddstroption_(ct.byref(fp), b"mu_strategy ", b"monotone  ",
                               ct.c_int(12), ct.c_int(10)) == 0

    x = (ipnumber * 4)(1.0, 5.0, 5.0, 1.0)
    g = (ipnumber * 2)()
    obj = ipnumber(0.0)
    mult_g = (ipnumber * 2)()
    mult_xl = (ipnumber * 4)()
    mult_xu = (ipnumber * 4)()
    status = lib.ipsolve_(ct.byref(fp), x, g, ct.byref(obj), mult_g,
                          mult_xl, mult_xu, None, None)
    assert status in (0, 1), status
    assert abs(obj.value - 17.0140171451792) < 1e-6, obj.value
    assert abs(x[0] - 1.0) < 1e-5
    lib.ipfree_(ct.byref(fp))
