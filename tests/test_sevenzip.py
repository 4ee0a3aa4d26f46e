"""Password-protected 7z subset: writer↔reader round trips per layout,
number codec, KDF determinism, failure modes (reference prep layer,
test_convert.py:262-298)."""

import io

import pytest

from jimmy_ray.sources import sevenzip as sz

MEMBERS = [
    ("Doc 7.md", b"# Doc 7\n\nhello world " * 10),
    ("meta/source.txt", b"export 7"),
    ("unicode éß.md", "café ✓".encode("utf-8")),
]


def test_number_codec_roundtrip():
    for n in (0, 1, 0x7F, 0x80, 0xFF, 0x100, 0x3FFF, 0x4000, 0xFFFF,
              0x1FFFFF, 0x200000, 0xFFFFFFFF, 0x123456789ABCDEF0,
              2**63, 2**64 - 1):
        enc = sz.write_number(n)
        assert sz.read_number(io.BytesIO(enc)) == n, hex(n)


@pytest.mark.parametrize("compress", [False, True])
@pytest.mark.parametrize("encrypt_header", [False, True])
def test_encrypted_roundtrip_all_layouts(compress, encrypt_header):
    archive = sz.build_7z(MEMBERS, password="pw", compress=compress,
                          encrypt_header=encrypt_header, cycles_power=8)
    assert archive[:6] == sz.SIGNATURE
    assert sz.parse_7z(archive, "pw") == MEMBERS
    if encrypt_header:
        # -mhe=on: filenames must not appear in the archive bytes
        assert "Doc 7.md".encode("utf-16-le") not in archive


@pytest.mark.parametrize("compress", [False, True])
@pytest.mark.parametrize("password", [None, "pw"])
def test_solid_folder_substreams_roundtrip(compress, password):
    archive = sz.build_7z(MEMBERS, password=password, compress=compress,
                          cycles_power=8, solid=True)
    assert sz.parse_7z(archive, password) == MEMBERS
    if compress:
        # solid layout must actually share one folder (one pack stream):
        # the archive is smaller than the one-folder-per-member build
        per_member = sz.build_7z(MEMBERS, password=password,
                                 compress=True, cycles_power=8)
        assert len(archive) < len(per_member)


def test_solid_empty_member_and_single_member():
    members = [("a.md", b""), ("b.md", b"x" * 100), ("c.md", b"")]
    archive = sz.build_7z(members, password="pw", cycles_power=8,
                          solid=True)
    assert sz.parse_7z(archive, "pw") == members
    one = sz.build_7z(members[:1], solid=True)
    assert sz.parse_7z(one) == members[:1]


def test_plain_archive_needs_no_password():
    archive = sz.build_7z(MEMBERS, password=None, compress=True)
    assert sz.parse_7z(archive) == MEMBERS


def test_wrong_or_missing_password_fails():
    archive = sz.build_7z(MEMBERS, password="pw", encrypt_header=True,
                          cycles_power=8)
    with pytest.raises(Exception):
        sz.parse_7z(archive, "wrong")
    with pytest.raises(ValueError):
        sz.parse_7z(archive)          # encrypted, no password given


def test_corrupt_archive_detected_by_crc():
    archive = bytearray(sz.build_7z(MEMBERS, password=None))
    archive[-3] ^= 0xFF               # flip a next-header byte
    with pytest.raises(ValueError, match="CRC"):
        sz.parse_7z(bytes(archive))


def test_kdf_deterministic_and_power_sensitive():
    k1 = sz.derive_key("pw", b"s" * 16, 8)
    assert k1 == sz.derive_key("pw", b"s" * 16, 8)
    assert len(k1) == 32
    assert k1 != sz.derive_key("pw", b"s" * 16, 9)
    assert k1 != sz.derive_key("pw2", b"s" * 16, 8)


def test_archives_are_byte_deterministic():
    a = sz.synth_7z(5, "stable text")
    assert a == sz.synth_7z(5, "stable text")
    out = sz.parse_7z(a, sz.PASSWORD)
    assert out[0][0] == "Doc 5.md"
    assert out[0][1].decode() == "# Doc 5\n\nstable text"


# --- container dispatch (sniff + explode + per-format member parse) ---------

from jimmy_ray.sources import container_dispatch as cd


def test_sniff_and_explode_all_kinds():
    for doc_id, want_kind in [(0, "zip"), (1, "sevenzip"), (2, "tar"),
                              (3, "zip"), (4, "sevenzip")]:
        payload = cd.synth_container(doc_id, "some text")
        assert cd.sniff_container(payload) == want_kind
        members = cd.explode_container(payload, sz.PASSWORD)
        assert [m for m, _ in members] == [
            f"Doc {doc_id}.md", "notes/body.html", "meta/source.txt"]
    assert cd.sniff_container(b"plain bytes, no magic here" + b"\0" * 300) is None


def test_container_stage_rows_and_dead_letter():
    import pyarrow as pa
    stage = cd.ContainerDispatchStage(password=sz.PASSWORD)
    batch = pa.table({
        "doc_id": pa.array([0, 1, 99], pa.int64()),
        "payload": pa.array([cd.synth_container(0, "alpha beta"),
                             cd.synth_container(1, "gamma delta"),
                             b"not a container" + b"\0" * 300], pa.binary()),
    })
    out = stage(batch).to_pydict()
    assert out["doc_id"] == [0, 0, 0, 1, 1, 1, 99]
    assert out["text"][0] == "# Doc 0\n\nalpha beta"
    assert out["text"][1] == "# Doc 0\n\nalpha beta"      # html → same md
    assert out["text"][2] == "export 0"
    assert out["fmt"][:3] == ["markdown", "html", "text"]
    assert out["error"][:6] == [None] * 6
    assert out["error"][6] == "unrecognized container magic"


def test_container_stage_wrong_password_is_error_row():
    import pyarrow as pa
    stage = cd.ContainerDispatchStage(password="wrong")
    batch = pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "payload": pa.array([cd.synth_container(1, "t")], pa.binary()),
    })
    out = stage(batch).to_pydict()
    assert len(out["doc_id"]) == 1 and out["error"][0]


def test_substream_crc_excludes_folders_with_defined_crc():
    """7zFormat.txt: SubStreamsInfo kCRC stores digests ONLY for streams
    whose CRC is not already defined by UnpackInfo folder CRCs (i.e.
    single-stream folders with defined CRCs are excluded)."""
    import io as _io

    w = sz.write_number
    folder_def = w(1) + bytes([0x01]) + sz.ID_COPY  # one Copy coder
    header = bytearray()
    header.append(sz.K_PACK_INFO)
    header += w(0) + w(2)                       # pack_pos, 2 pack streams
    header.append(sz.K_SIZE)
    header += w(10) + w(20)
    header.append(sz.K_END)
    header.append(sz.K_UNPACK_INFO)
    header.append(sz.K_FOLDER)
    header += w(2) + b"\x00" + folder_def + folder_def
    header.append(sz.K_UNPACK_SIZES)
    header += w(10) + w(20)
    header.append(sz.K_CRC)
    header += b"\x01" + b"\xAA" * 8             # both folder CRCs defined
    header.append(sz.K_END)
    header.append(sz.K_SUBSTREAMS)
    header.append(sz.K_NUM_UNPACK_STREAM)
    header += w(1) + w(2)                       # folder2 holds 2 streams
    header.append(sz.K_SIZE)
    header += w(5)                              # folder2: first substream
    header.append(sz.K_CRC)
    header += b"\x01" + b"\xBB" * 8             # ONLY folder2's 2 streams
    header.append(sz.K_END)
    header.append(sz.K_END)
    header.append(sz.K_END)                     # end of StreamsInfo

    info = sz._parse_streams_info(_io.BytesIO(bytes(header)))
    assert info["substreams"]["counts"] == [1, 2]
    assert info["substreams"]["sizes"] == [[10], [5, 15]]
    assert info["folder_crc_defined"] == [True, True]


@pytest.mark.parametrize("codec", ["copy", "lzma", "lzma2", "bzip2"])
@pytest.mark.parametrize("password", [None, "pw"])
def test_all_codecs_roundtrip(codec, password):
    archive = sz.build_7z(MEMBERS, password=password, compress=codec,
                          cycles_power=8)
    assert sz.parse_7z(archive, password) == MEMBERS
    # solid layout per codec too (one shared stream split by sizes)
    archive = sz.build_7z(MEMBERS, password=password, compress=codec,
                          cycles_power=8, solid=True)
    assert sz.parse_7z(archive, password) == MEMBERS
