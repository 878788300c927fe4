"""Generate juliachem_jl_tpu/basis/data/basis_library.json.

Provenance of the primitive data:
* 6-31G / 6-311G / STO-3G cores and standard polarization/diffuse exponents:
  published literature values (Hehre/Ditchfield/Pople 1972; Krishnan et al.
  1980; Frisch/Pople/Binkley 1984; Clark et al. 1983), cross-checked digit-by-
  digit against the basis printouts in the reference's committed run logs
  (/root/reference/test/s10_new_algo-3-20.log, contract_by_hand_coul.log,
  water_ccpvdz_out.log — JuliaChem prints its bsed.h5 contents at output=3).
* cc-pVDZ (H, O) and the cc-pVTZ-JKFIT / cc-pVDZ-JKFIT auxiliary sets (H, C,
  O): transcribed from those same log printouts (the reference's bsed.h5 uses
  a "trimmed" general-contraction form of cc-pVDZ in which the outermost
  diffuse primitive is removed from the contracted shells and kept as a free
  function; we reproduce that form exactly).
* cc-pVDZ (C, N): published Dunning 1989 values in the same trimmed form.
* cc-pVTZ-JKFIT (N) and cc-pVDZ-JKFIT (C, N): no transcribable source in
  this environment (only inside the reference's absent auxilliary_bsed.h5),
  so the library deliberately omits them and DF builds fall back to the
  even-tempered AutoAux generator (basis/library.py::autoaux), measured more
  accurate than interpolated stand-in tables (NH3/6-31G*: 2.2e-7 Eh vs
  6.8e-6 Eh against conventional RHF) under the reference's 1.5e-3 Eh DF
  parity tolerance (test/runtests.jl:63).

Shell types: "S","P","D","F","G" or "L" (sp shell with separate s/p
coefficient lists, split into s+p at build time exactly as the reference does
in src/basis/JCBasis.jl:244-290).
"""

import json

import os

LIB = {}


def add(basis, element, shells):
    LIB.setdefault(basis, {})[element] = shells


def S(exps, coefs=None):
    coefs = coefs if coefs is not None else [1.0] * len(exps)
    return {"l": "S", "exps": list(exps), "coefs": list(coefs)}


def sh(l, exps, coefs=None):
    coefs = coefs if coefs is not None else [1.0] * len(exps)
    return {"l": l, "exps": list(exps), "coefs": list(coefs)}


def L(exps, cs, cp):
    return {"l": "L", "exps": list(exps), "coefs_s": list(cs), "coefs_p": list(cp)}


# ---------------------------------------------------------------------------
# STO-3G (Hehre, Stewart, Pople 1969)
# ---------------------------------------------------------------------------
_sto_c1 = [0.15432897, 0.53532814, 0.44463454]
_sto_cs2 = [-0.09996723, 0.39951283, 0.70011547]
_sto_cp2 = [0.15591627, 0.60768372, 0.39195739]
add("STO-3G", "H", [S([3.42525091, 0.62391373, 0.16885540], _sto_c1)])
add("STO-3G", "C", [
    S([71.6168370, 13.0450960, 3.5305122], _sto_c1),
    L([2.9412494, 0.6834831, 0.2222899], _sto_cs2, _sto_cp2),
])
add("STO-3G", "N", [
    S([99.1061690, 18.0523120, 4.8856602], _sto_c1),
    L([3.7804559, 0.8784966, 0.2857144], _sto_cs2, _sto_cp2),
])
add("STO-3G", "O", [
    S([130.7093200, 23.8088610, 6.4436083], _sto_c1),
    L([5.0331513, 1.1695961, 0.3803890], _sto_cs2, _sto_cp2),
])
add("STO-3G", "F", [
    S([166.6791300, 30.3608120, 8.2168207], _sto_c1),
    L([6.4648032, 1.5022812, 0.4885885], _sto_cs2, _sto_cp2),
])

# ---------------------------------------------------------------------------
# 6-31G cores (Hehre/Ditchfield/Pople 1972)
# ---------------------------------------------------------------------------
CORE_631G = {
    "H": [
        S([18.7311370, 2.8253937, 0.6401217], [0.03349460, 0.23472695, 0.81375733]),
        S([0.1612778]),
    ],
    "C": [
        S([3047.5249, 457.36951, 103.94869, 29.210155, 9.2866630, 3.1639270],
          [0.0018347, 0.0140373, 0.0688426, 0.2321844, 0.4679413, 0.3623120]),
        L([7.8682724, 1.8812885, 0.5442493],
          [-0.1193324, -0.1608542, 1.1434564],
          [0.0689991, 0.3164240, 0.7443083]),
        L([0.1687144], [1.0], [1.0]),
    ],
    # N 6-31G: published Hehre/Ditchfield/Pople 1972 values (standard
    # distribution digits), validated against the S22 GAMESS goldens for the
    # nitrogen-containing systems (S1 ammonia dimer et al.).
    "N": [
        S([4173.5110, 627.45790, 142.90210, 40.234330, 12.820210, 4.3904370],
          [0.0018348, 0.0139950, 0.0685870, 0.2322410, 0.4690700, 0.3604550]),
        L([11.626358, 2.7162800, 0.7722180],
          [-0.1149610, -0.1691180, 1.1458520],
          [0.0675800, 0.3239070, 0.7408950]),
        L([0.2120313], [1.0], [1.0]),
    ],
    "O": [
        S([5484.6717, 825.23495, 188.04696, 52.964500, 16.897570, 5.7996353],
          [0.0018311, 0.0139501, 0.0684451, 0.2327143, 0.4701930, 0.3585209]),
        L([15.539616, 3.5999336, 1.0137618],
          [-0.1107775, -0.1480263, 1.1307670],
          [0.0708743, 0.3397528, 0.7271586]),
        L([0.2700058], [1.0], [1.0]),
    ],
    # F 6-31G: published Hehre/Ditchfield/Pople 1972 values (standard
    # distribution digits).  Still flagged unverified-vs-goldens: no
    # F-containing golden exists in this environment (S22 has no fluorine).
    "F": [
        S([7001.71309, 1051.36609, 239.285692, 67.3974453, 21.5199573, 7.40310130],
          [0.0018196169, 0.0139160796, 0.0684053245, 0.2331857600,
           0.4712674390, 0.3566185460]),
        L([20.8479528, 4.80830834, 1.34406986],
          [-0.108506975, -0.146451658, 1.128688580],
          [0.0716287243, 0.3459121030, 0.7224699570]),
        L([0.358151393], [1.0], [1.0]),
    ],
}

# Standard single polarization (6-31G*) and diffuse (6-31+G) exponents.
POL_D = {"C": 0.8, "N": 0.8, "O": 0.8}
POL_P_H = 1.1
DIFFUSE_SP = {"C": 0.0438, "N": 0.0639, "O": 0.0845}
DIFFUSE_S_H = 0.0360

# Frisch/Pople/Binkley 1984 multiple-polarization exponents, as present in the
# reference's bsed.h5 "6-31G(2df,p)" (verified vs. s10/contract_by_hand logs —
# note bsed.h5 gives H TWO p shells [1.5, 0.375] for this basis name).
POL_2D = {"C": [1.252, 0.313], "N": [1.826, 0.4565], "O": [2.584, 0.646]}
POL_F = {"C": 0.8, "N": 1.0, "O": 1.4}
POL_2P_H = [1.5, 0.375]

for el, shells in CORE_631G.items():
    add("6-31G", el, [dict(s) for s in shells])

def _compose(core_el, el, extra):
    return [dict(s) for s in CORE_631G[core_el]] + extra

POL_D["F"] = 0.8
DIFFUSE_SP["F"] = 0.1076
for el in ["C", "N", "O", "F"]:
    add("6-31G*", el, _compose(el, el, [sh("D", [POL_D[el]])]))
    add("6-31G**", el, _compose(el, el, [sh("D", [POL_D[el]])]))
    add("6-31+G*", el, [dict(CORE_631G[el][0])]
        + [dict(s) for s in CORE_631G[el][1:]]
        + [L([DIFFUSE_SP[el]], [1.0], [1.0]), sh("D", [POL_D[el]])])
    add("6-31+G**", el, LIB["6-31+G*"][el])
    add("6-31++G**", el, LIB["6-31+G*"][el])
    if el in POL_2D:
        add("6-31G(2df,p)", el, _compose(el, el, [
            sh("D", [POL_2D[el][0]]), sh("D", [POL_2D[el][1]]), sh("F", [POL_F[el]]),
        ]))
add("6-31G*", "H", [dict(s) for s in CORE_631G["H"]])
add("6-31G**", "H", _compose("H", "H", [sh("P", [POL_P_H])]))
add("6-31+G*", "H", [dict(s) for s in CORE_631G["H"]])
add("6-31+G**", "H", _compose("H", "H", [sh("P", [POL_P_H])]))
add("6-31++G**", "H", _compose("H", "H", [S([DIFFUSE_S_H]), sh("P", [POL_P_H])]))
add("6-31G(2df,p)", "H", _compose("H", "H", [sh("P", [POL_2P_H[0]]), sh("P", [POL_2P_H[1]])]))

# ---------------------------------------------------------------------------
# 6-311G cores (Krishnan, Binkley, Seeger, Pople 1980)
# ---------------------------------------------------------------------------
CORE_6311G = {
    "H": [
        S([33.86500, 5.094790, 1.158790], [0.0254938, 0.190373, 0.852161]),
        S([0.325840]),
        S([0.102741]),
    ],
    "C": [
        S([4563.240, 682.0240, 154.9730, 44.45530, 13.02900, 1.827730],
          [0.00196665, 0.0152306, 0.0761269, 0.2608010, 0.6164620, 0.2210060]),
        L([20.96420, 4.803310, 1.459330],
          [0.114660, 0.919999, -0.00303068],
          [0.0402487, 0.2375940, 0.8158540]),
        L([0.4834560], [1.0], [1.0]),
        L([0.1455850], [1.0], [1.0]),
    ],
    # N 6-311G verified digit-for-digit against the GAMESS printout committed
    # in the reference (benchmarks/.../ammonia_trimer.output)
    "N": [
        S([6293.480, 949.0440, 218.7760, 63.69160, 18.82820, 2.720230],
          [0.00196978815, 0.0149612859, 0.0735005308, 0.2489367658,
           0.6024594331, 0.2562017589]),
        L([30.63310, 7.026140, 2.112050],
          [0.1119060795, 0.9216666549, -0.0025691918],
          [0.0383119186, 0.2374031155, 0.8175923978]),
        L([0.684009], [1.0], [1.0]),
        L([0.200878], [1.0], [1.0]),
    ],
    "O": [
        S([8588.500, 1297.230, 299.2960, 87.37710, 25.67890, 3.740040],
          [0.00189515, 0.0143859, 0.0707320, 0.2400010, 0.5947970, 0.2808020]),
        L([42.11750, 9.628370, 2.853320],
          [0.113889, 0.920811, -0.00327447],
          [0.0365114, 0.2371530, 0.8197020]),
        L([0.905661], [1.0], [1.0]),
        L([0.255611], [1.0], [1.0]),
    ],
}
POL_D_6311 = {"C": 0.626, "N": 0.913, "O": 1.292}
POL_P_H_6311 = 0.750

for el, shells in CORE_6311G.items():
    add("6-311G", el, [dict(s) for s in shells])
for el in ["C", "N", "O"]:
    add("6-311G**", el, [dict(s) for s in CORE_6311G[el]] + [sh("D", [POL_D_6311[el]])])
    add("6-311++G**", el,
        [dict(s) for s in CORE_6311G[el]]
        + [L([DIFFUSE_SP[el]], [1.0], [1.0]), sh("D", [POL_D_6311[el]])])
add("6-311G**", "H", [dict(s) for s in CORE_6311G["H"]] + [sh("P", [POL_P_H_6311])])
add("6-311++G**", "H",
    [dict(s) for s in CORE_6311G["H"]] + [S([DIFFUSE_S_H]), sh("P", [POL_P_H_6311])])

# 6-311++G(2d,2p): composition verified digit-for-digit against the GAMESS
# ATOMIC BASIS SET printouts committed in the reference
# (benchmarks/S22_3-GAMESS-vs-JuliaChem-vs-Psi4/GAMESS-111thread/*.output)
for el in ["C", "N", "O"]:
    add("6-311++G(2d,2p)", el,
        [dict(s) for s in CORE_6311G[el]]
        + [L([DIFFUSE_SP[el]], [1.0], [1.0]),
           sh("D", [POL_2D[el][0]]), sh("D", [POL_2D[el][1]])])
add("6-311++G(2d,2p)", "H",
    [dict(s) for s in CORE_6311G["H"]]
    + [S([DIFFUSE_S_H]), sh("P", [POL_2P_H[0]]), sh("P", [POL_2P_H[1]])])

# 6-311++G(3df,3pd) (the ARPA-E fig1* production basis,
# example_inputs/ARPA-E/6-311/*.json): the standard Pople splitting of the
# single polarization exponent into three, d_i = d*(4, 1, 1/4) (the same
# geometric convention as the 2d = d*(2, 1/2) sets above), one f set
# (Frisch, Pople, Binkley 1984: C 0.8, N 1.0, O 1.4), and for H
# p_i = 0.75*(4, 1, 1/4) plus a d with exponent 1.0.  Validated against the
# reference's committed fig1e output (ARPA-E/6-311/fig1e_112thread.output,
# Total SCF Energy -903.7991936826).
for el in ["C", "N", "O"]:
    _b = POL_D_6311[el]
    add("6-311++G(3df,3pd)", el,
        [dict(s) for s in CORE_6311G[el]]
        + [L([DIFFUSE_SP[el]], [1.0], [1.0]),
           sh("D", [4.0 * _b]), sh("D", [_b]), sh("D", [_b / 4.0]),
           sh("F", [POL_F[el]])])
add("6-311++G(3df,3pd)", "H",
    [dict(s) for s in CORE_6311G["H"]]
    + [S([DIFFUSE_S_H]), sh("P", [4.0 * POL_P_H_6311]), sh("P", [POL_P_H_6311]),
       sh("P", [POL_P_H_6311 / 4.0]), sh("D", [1.0])])

# 6-311G(2df,2pd): non-diffuse variant used by the reference's
# density_fitting/H2_rhf.json.  Same Pople splitting conventions as above:
# H gets 2p = p*(2, 1/2) (the POL_2P_H pair) plus a d with exponent 1.0;
# heavy atoms get 2d = d*(2, 1/2) plus one f (Frisch/Pople/Binkley 1984).
for el in ["C", "N", "O"]:
    add("6-311G(2df,2pd)", el,
        [dict(s) for s in CORE_6311G[el]]
        + [sh("D", [POL_2D[el][0]]), sh("D", [POL_2D[el][1]]),
           sh("F", [POL_F[el]])])
add("6-311G(2df,2pd)", "H",
    [dict(s) for s in CORE_6311G["H"]]
    + [sh("P", [POL_2P_H[0]]), sh("P", [POL_2P_H[1]]), sh("D", [1.0])])

# ---------------------------------------------------------------------------
# cc-pVDZ in the reference bsed.h5 trimmed-general-contraction form
# (H, O transcribed from water_ccpvdz_out.log; C, N from Dunning 1989 in the
#  same trimmed form).
# ---------------------------------------------------------------------------
add("cc-pVDZ", "H", [
    S([13.0100, 1.9620, 0.4446], [0.019685, 0.137977, 0.478148]),
    S([0.1220]),
    sh("P", [0.7270]),
])
add("cc-pVDZ", "O", [
    S([11720.0, 1759.0, 400.8, 113.7, 37.03, 13.27, 5.025, 1.013],
      [0.000710, 0.005470, 0.027837, 0.104800, 0.283062, 0.448719, 0.270952, 0.015458]),
    S([11720.0, 1759.0, 400.8, 113.7, 37.03, 13.27, 5.025, 1.013],
      [-0.000160, -0.001263, -0.006267, -0.025716, -0.070924, -0.165411, -0.116955, 0.557368]),
    S([0.3023]),
    sh("P", [17.70, 3.854, 1.046], [0.043018, 0.228913, 0.508728]),
    sh("P", [0.2753]),
    sh("D", [1.185]),
])
add("cc-pVDZ", "C", [
    S([6665.0, 1000.0, 228.0, 64.71, 21.06, 6.459, 2.191, 0.6968],
      [0.000692, 0.005329, 0.027077, 0.101718, 0.274740, 0.448564, 0.285074, 0.015204]),
    S([6665.0, 1000.0, 228.0, 64.71, 21.06, 6.459, 2.191, 0.6968],
      [-0.000146, -0.001154, -0.005725, -0.023312, -0.063955, -0.149981, -0.127262, 0.544529]),
    S([0.1564]),
    sh("P", [9.439, 2.002, 0.5456], [0.038109, 0.209480, 0.508557]),
    sh("P", [0.1517]),
    sh("D", [0.5500]),
])
add("cc-pVDZ", "N", [
    S([9046.0, 1357.0, 309.3, 87.73, 28.56, 9.464, 3.413, 1.181],
      [0.000700, 0.005389, 0.027406, 0.103207, 0.278723, 0.448540, 0.278238, 0.015440]),
    S([9046.0, 1357.0, 309.3, 87.73, 28.56, 9.464, 3.413, 1.181],
      [-0.000153, -0.001208, -0.005992, -0.024544, -0.067459, -0.158078, -0.121831, 0.549003]),
    S([0.3319]),
    sh("P", [13.55, 2.917, 0.7973], [0.039919, 0.217169, 0.510319]),
    sh("P", [0.2185]),
    sh("D", [0.8170]),
])

# ---------------------------------------------------------------------------
# Auxiliary (density-fitting) sets — fully uncontracted.
# cc-pVTZ-JKFIT H/C/O transcribed from reference log printouts.
# ---------------------------------------------------------------------------
def uncontracted(spec):
    out = []
    for l, exps in spec:
        for e in exps:
            out.append(sh(l, [e]))
    return out

add("cc-pVTZ-JKFIT", "H", uncontracted([
    ("S", [9.530249, 1.917451, 0.684240, 0.284133]),
    ("P", [2.913323, 1.262121, 0.501998]),
    ("D", [2.313533, 0.712907]),
    ("F", [1.656573]),
]))
_jk_tz_C = [
    ("S", [1113.986772, 369.162342, 121.792752, 48.127115, 20.365074,
           8.088360, 2.506866, 1.243854, 0.484499, 0.191852]),
    ("P", [102.991762, 28.132594, 9.836432, 3.349054, 1.494762, 0.576901, 0.203201]),
    ("D", [10.594068, 3.599720, 1.335569, 0.519498, 0.199541]),
    ("F", [1.194866, 0.415866]),
    ("G", [0.858866]),
]
_jk_tz_O = [
    ("S", [1517.866751, 489.679520, 176.721187, 63.792233, 25.366499,
           9.913549, 4.464531, 1.801774, 0.807897, 0.338643]),
    ("P", [120.160309, 34.409622, 12.581149, 5.066382, 2.034693, 0.860930, 0.366814]),
    ("D", [19.043063, 5.806038, 2.189184, 0.877946, 0.356236]),
    ("F", [2.493915, 0.824915]),
    ("G", [1.607915]),
]
add("cc-pVTZ-JKFIT", "C", uncontracted(_jk_tz_C))
add("cc-pVTZ-JKFIT", "O", uncontracted(_jk_tz_O))
# N: no transcribable table exists in this environment (the reference ships
# it only inside auxilliary_bsed.h5, which is absent from the snapshot).
# Rather than shipping a synthesized stand-in, the library omits the entry
# and build_auxiliary falls back to the even-tempered AutoAux generator
# (basis/library.py::autoaux) — measured MORE accurate than the former
# geometric-mean interpolation on NH3/6-31G*: |E_DF - E_conv| = 2.2e-7 Eh
# (autoaux, naux=293) vs 6.8e-6 Eh (interpolated table, naux=201).

add("cc-pVDZ-JKFIT", "H", uncontracted([
    ("S", [5.115890, 1.142965, 0.291662]),
    ("P", [1.914964, 0.986401]),
    ("D", [1.172083]),
]))
_jk_dz_O = [
    ("S", [109.461000, 25.578000, 9.551480, 2.939600, 1.396380, 0.905061, 0.421376]),
    ("P", [36.129200, 10.881700, 3.205940, 1.403870, 0.612763]),
    ("D", [15.251100, 4.520870, 1.812210, 0.592201]),
    ("F", [4.221940, 1.790210]),
]
add("cc-pVDZ-JKFIT", "O", uncontracted(_jk_dz_O))
# cc-pVDZ-JKFIT C/N: like cc-pVTZ-JKFIT N above, no real table is available
# in this snapshot — omitted so the AutoAux fallback covers them.

# ---------------------------------------------------------------------------
# Lithium (unlocks the ARPA-E fig1a/b/g/h/i inputs, C/H/Li/O).  6-31G core:
# Dill & Pople, JCP 62, 2921 (1975); 6-311G core: Krishnan, Binkley, Seeger,
# Pople, JCP 72, 650 (1980).  Standard diffuse sp 0.0074 and d 0.200 for Li.
# No Li-containing golden exists in this snapshot (the committed ARPA-E
# outputs cover only the Li-free fig1e), so like fluorine these are flagged
# unverified-vs-goldens and pinned by physics tests instead
# (tests/test_lithium.py: ROHF atom energy window + virial ratio).
# ---------------------------------------------------------------------------
CORE_631G_LI = [
    S([642.418915, 96.7985153, 22.0911212, 6.20107025, 1.93511768,
       0.636735789],
      [0.00214260781, 0.0162088715, 0.0773155725, 0.245786052, 0.470189004,
       0.345470845]),
    L([2.32491867, 0.632430223, 0.0790534627],
      [-0.0350917289, -0.191232844, 1.08398780],
      [0.00894150804, 0.141009464, 0.945363695]),
    L([0.0359620657], [1.0], [1.0]),
]
CORE_6311G_LI = [
    S([900.4600, 134.4330, 30.43650, 8.626390, 2.483320, 0.3031790],
      [0.00228704, 0.0176350, 0.0873434, 0.2809770, 0.6587410, 0.118712]),
    L([4.868900, 0.856924, 0.243227],
      [0.0933293, 0.9430450, -0.00279827],
      [0.0327661, 0.1597920, 0.8856670]),
    L([0.0635070], [1.0], [1.0]),
    L([0.0243683], [1.0], [1.0]),
]
DIFFUSE_SP_LI = 0.0074
POL_D_LI = 0.200
add("6-31G", "Li", [dict(s) for s in CORE_631G_LI])
add("6-31G*", "Li", [dict(s) for s in CORE_631G_LI] + [sh("D", [POL_D_LI])])
add("6-31G**", "Li", LIB["6-31G*"]["Li"])
add("6-31+G*", "Li", [dict(s) for s in CORE_631G_LI]
    + [L([DIFFUSE_SP_LI], [1.0], [1.0]), sh("D", [POL_D_LI])])
add("6-31+G**", "Li", LIB["6-31+G*"]["Li"])
add("6-31++G**", "Li", LIB["6-31+G*"]["Li"])
add("6-311G", "Li", [dict(s) for s in CORE_6311G_LI])
add("6-311G**", "Li", [dict(s) for s in CORE_6311G_LI]
    + [sh("D", [POL_D_LI])])
add("6-311++G**", "Li", [dict(s) for s in CORE_6311G_LI]
    + [L([DIFFUSE_SP_LI], [1.0], [1.0]), sh("D", [POL_D_LI])])
add("6-311++G(2d,2p)", "Li", [dict(s) for s in CORE_6311G_LI]
    + [L([DIFFUSE_SP_LI], [1.0], [1.0]),
       sh("D", [2.0 * POL_D_LI]), sh("D", [POL_D_LI / 2.0])])
# (3df): d*(4,1,1/4) + f 0.15 (the Gaussian-tabulated Li f exponent — the
# least certain value here; flagged approximate below)
add("6-311++G(3df,3pd)", "Li", [dict(s) for s in CORE_6311G_LI]
    + [L([DIFFUSE_SP_LI], [1.0], [1.0]),
       sh("D", [4.0 * POL_D_LI]), sh("D", [POL_D_LI]),
       sh("D", [POL_D_LI / 4.0]), sh("F", [0.15])])

META = {
    # F was verified round 3 (f4da7be/4928e0c) against Szabo-Ostlund and
    # CCCBDB goldens — keep it OUT of this list or the regeneration clobbers
    # the verified state (it did once, breaking
    # tests/test_features.py::test_basis_lookup_casefold_and_warnings).
    # Li carries published values but no Li golden exists here;
    # tests/test_lithium.py pins the physics instead.
    "unverified_vs_goldens": [["6-31G", "Li"], ["6-31+G**", "Li"],
                              ["6-311G", "Li"], ["6-311++G(3df,3pd)", "Li"]],
    "approximate": [["6-311++G(3df,3pd)", "Li"]],  # the f exponent 0.15
    "synthesized": [],
    "verification_notes": (
        "F verified 2026-08-18: RHF/STO-3G HF@1.7328a0 = -98.57077532 vs "
        "Szabo-Ostlund -98.5707; RHF/6-31G* HF@0.911A = -100.00290698 vs "
        "CCCBDB -100.002907; STO-3G zeta-scaling identity + <=1e-7 shell "
        "normalization for the 6-31G family (tests/test_fluorine.py)"),
}

out_path = os.path.join(
    os.path.dirname(__file__), "..", "juliachem_jl_tpu", "basis", "data",
    "basis_library.json",
)
with open(os.path.abspath(out_path), "w") as f:
    json.dump({"__meta__": META, **LIB}, f, indent=None, separators=(",", ":"))
print(f"wrote {os.path.abspath(out_path)}")
for b, els in LIB.items():
    print(f"  {b:20s}: {sorted(els)}")
