"""Container writers: DDS, KTX, PVR.

Byte-exact per the reference's writers (`/root/reference/lib/src/SaveDds.cpp`,
`SaveKtx.cpp`, `SavePvr.cpp`), including the differing surface orders: DDS is
element->face->mip->volume, KTX and PVR are mip->depth->face.
"""
