"""Pytest plugin: dump explicit autotest annotations at collection time.

The pytest analog of the reference's proc-macro emission
(`println!("!! liquid test annotation: {} -> {} !!")`,
/root/reference/test_macro/src/lib.rs:6-23), consumed by tools/gen_compat.py
the way compare-test.py:37-82 consumes cargo test output.

Usage: pytest --collect-only -q -p tools.autotest_dump tests/
Emits lines:  !! autotest: <liquid_name> -> <nodeid> !!
"""


def pytest_collection_finish(session):
    for item in session.items:
        for mark in item.iter_markers(name="autotest"):
            names = mark.kwargs.get("names") or mark.args
            param_map = mark.kwargs.get("param_map")
            if not hasattr(param_map, "items"):
                # free-text annotations (documentation-only) are not maps
                param_map = None
            emitted = False
            if param_map:
                callspec = getattr(item, "callspec", None)
                # match keys against the bracketed param id ("[dpsk2]") so a
                # key "[psk2]" cannot alias into "[dpsk2]"
                probe = f"[{callspec.id}]" if callspec is not None else ""
                for key, val in param_map.items():
                    if key in probe:
                        names_v = val if isinstance(val, (tuple, list)) else (val,)
                        for name in names_v:
                            print(f"!! autotest: {name} -> {item.nodeid} !!")
                        emitted = True
            if names:
                for name in names:
                    print(f"!! autotest: {name} -> {item.nodeid} !!")
                    emitted = True
            if not emitted and not names:
                print(f"!! autotest-unresolved: {item.nodeid} !!")
