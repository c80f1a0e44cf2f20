"""Patches applied to a COPY of the reference source for the oracle
build (see build_oracle.sh).  Idempotent: each patch checks whether it
already applied."""
import sys


def patch(path, pairs):
    with open(path) as f:
        s = f.read()
    changed = False
    for old, new in pairs:
        if old in s:
            s = s.replace(old, new)
            changed = True
        elif new not in s:
            raise SystemExit(f"patch target not found in {path}:\n{old[:120]}")
    if changed:
        with open(path, "w") as f:
            f.write(s)
    print(("patched " if changed else "already ok ") + path)


def main(src):
    patch(f"{src}/core/api.cpp", [
        ('#include "integrators/iispt.h"',
         '// oracle build: iispt excluded (needs rapidjson/ext)'),
        ('#include "textures/ptex.h"',
         '// oracle build: ptex excluded (needs ext Ptex)'),
        ('''    if (name == std::string("iispt") && PbrtOptions.referenceTiles == -1) {
        // Initialize NN connectors
        iile::NnConnectorManager::getInstance().start(iile::cpusCountFull());
        // Register SIGINT handler
        std::signal(SIGINT, iileSigintHandler);
    }''',
         '''    if (name == std::string("iispt")) {
        Error("oracle build: iispt integrator not compiled");
        exit(1);
    }'''),
        ('''    } else if (IntegratorName == "iispt") {
        std::cerr << "api.cpp: Call CreateIISPTIntegrator\\n";
        // Create aux camera
        std::shared_ptr<Camera> dcamera (MakeCamera(PbrtOptions.iisptHemiSize, PbrtOptions.iisptHemiSize));
        // Create integrator
        integrator = CreateIISPTIntegrator(IntegratorParams, camera,
            dcamera);
    } else {''',
         '    } else {'),
        ('''    else if (name == "ptex")
        tex = CreatePtexFloatTexture(tex2world, tp);''',
         '''    else if (name == "ptex")
        Error("oracle build: ptex not compiled");'''),
        ('''    else if (name == "ptex")
        tex = CreatePtexSpectrumTexture(tex2world, tp);''',
         '''    else if (name == "ptex")
        Error("oracle build: ptex not compiled");'''),
    ])
    # the sigint handler references the NN connector manager; make it a
    # plain exit
    with open(f"{src}/core/api.cpp") as f:
        s = f.read()
    if "NnConnectorManager" in s:
        import re
        s = re.sub(
            r"void iileSigintHandler\(int x\) \{.*?\n\}",
            "void iileSigintHandler(int x) {\n    exit(1);\n}",
            s, count=1, flags=re.S)
        with open(f"{src}/core/api.cpp", "w") as f:
            f.write(s)
        print("patched sigint handler")
    patch(f"{src}/main/pbrt.cpp", [
        ('#include "tests/iispt.h"',
         '// oracle build: iispt test harness excluded'),
    ])
    patch(f"{src}/core/imageio.cpp", [
        ('''        RgbaOutputFile file(name.c_str(), displayWindow, dataWindow,
                            WRITE_RGBA);''',
         '''        // oracle build: ZIPS instead of default PIZ so the python
        // scanline reader (pbrt_v3_iile_tpu/utils/image.py) can ingest
        // the output directly
        RgbaOutputFile file(name.c_str(), displayWindow, dataWindow,
                            WRITE_RGBA, 1, Imath::V2f(0, 0), 1,
                            INCREASING_Y, ZIPS_COMPRESSION);'''),
    ])


if __name__ == "__main__":
    main(sys.argv[1])
