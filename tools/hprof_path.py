#!/usr/bin/env python3
"""Minimal hprof analyzer: find a path from GC roots to a target object.

Usage: hprof_path.py <dump.hprof> <targetClassName> <intFieldName>=<value>

Finds instances of targetClassName whose int field matches, then
reverse-BFSes to a GC root, excluding java.lang.ref.Reference.referent
edges (weak paths) unless --soft re-adds them for SoftReference.
Prints the chain with field names and the root kind/thread.
"""
import struct, sys
from collections import defaultdict, deque

f = open(sys.argv[1], 'rb')
target_class = sys.argv[2]
field_name, field_val = sys.argv[3].split('=')
field_val = int(field_val)

hdr = b''
while True:
    c = f.read(1)
    if c == b'\x00': break
    hdr += c
id_size = struct.unpack('>I', f.read(4))[0]
f.read(8)
assert id_size == 8
def u1(b, o): return b[o]
def u2(b, o): return struct.unpack_from('>H', b, o)[0]
def u4(b, o): return struct.unpack_from('>I', b, o)[0]
def u8(b, o): return struct.unpack_from('>Q', b, o)[0]

strings = {}
classname = {}          # classObjId -> name
roots = {}              # objId -> root desc
thread_serial_to_obj = {}
class_dump = {}         # classObjId -> (superId, [(declClassId, fname, type)], static_refs, instSize)
instances = []          # (objId, classObjId, body offset, nbytes) -- parse later
obj_arrays = {}         # objId -> list of ids (kept lazily: store (offset,count) )
edges_rev = defaultdict(list)   # child -> [(parent, label)]
type_size = {2:8,4:1,5:2,6:4,7:8,8:1,9:2,10:4,11:8}

data = f.read()
print(f"[hprof] loaded {len(data)} bytes", file=sys.stderr)
pos = 0
heap_segs = []
while pos < len(data):
    tag = data[pos]; length = u4(data, pos+5); body = pos + 9
    if tag == 0x01:
        sid = u8(data, body)
        strings[sid] = data[body+8:body+length].decode('utf-8', 'replace')
    elif tag == 0x02:
        cobj = u8(data, body+4)
        nameid = u8(data, body+16)
        classname[cobj] = strings.get(nameid, '?')
    elif tag in (0x0C, 0x1C):
        heap_segs.append((body, body + length))
    pos = body + length

# pass over heap segments
for seg_start, seg_end in heap_segs:
    o = seg_start
    while o < seg_end:
        st = data[o]; o += 1
        if st == 0xFF: roots[u8(data,o)] = 'ROOT_UNKNOWN'; o += 8
        elif st == 0x01: roots[u8(data,o)] = 'ROOT_JNI_GLOBAL'; o += 16
        elif st == 0x02:
            roots[u8(data,o)] = f'ROOT_JNI_LOCAL thread={u4(data,o+8)} frame={u4(data,o+12)}'; o += 16
        elif st == 0x03:
            roots[u8(data,o)] = f'ROOT_JAVA_FRAME thread={u4(data,o+8)} frame={u4(data,o+12)}'; o += 16
        elif st == 0x04:
            roots[u8(data,o)] = f'ROOT_NATIVE_STACK thread={u4(data,o+8)}'; o += 12
        elif st == 0x05: roots[u8(data,o)] = 'ROOT_STICKY_CLASS'; o += 8
        elif st == 0x06:
            roots[u8(data,o)] = f'ROOT_THREAD_BLOCK thread={u4(data,o+8)}'; o += 12
        elif st == 0x07: roots[u8(data,o)] = 'ROOT_MONITOR_USED'; o += 8
        elif st == 0x08:
            oid = u8(data,o); ts = u4(data,o+8)
            roots[oid] = f'ROOT_THREAD_OBJ thread={ts}'
            thread_serial_to_obj[ts] = oid; o += 16
        elif st == 0x20:
            cid = u8(data,o); sup = u8(data,o+12); o2 = o + 8*7 + 4 + 4
            npool = u2(data,o2); o2 += 2
            for _ in range(npool):
                t = data[o2+2]; o2 += 3 + type_size[t]
            nstat = u2(data,o2); o2 += 2
            static_refs = []
            for _ in range(nstat):
                nm = u8(data,o2); t = data[o2+8]; o2 += 9
                if t == 2:
                    v = u8(data,o2)
                    if v: static_refs.append((v, strings.get(nm,'?')))
                o2 += type_size[t]
            nf = u2(data,o2); o2 += 2
            fields = []
            for _ in range(nf):
                nm = u8(data,o2); t = data[o2+8]; o2 += 9
                fields.append((strings.get(nm,'?'), t))
            class_dump[cid] = (sup, fields, static_refs)
            o = o2
        elif st == 0x21:
            oid = u8(data,o); cid = u8(data,o+12); nb = u4(data,o+20)
            instances.append((oid, cid, o+24))
            o += 24 + nb
        elif st == 0x22:
            oid = u8(data,o); n = u4(data,o+12); acid = u8(data,o+16)
            base = o + 24
            for i in range(n):
                v = u8(data, base + 8*i)
                if v: edges_rev[v].append((oid, f'[{i}]'))
            obj_arrays[oid] = acid
            o = base + 8*n
        elif st == 0x23:
            oid = u8(data,o); n = u4(data,o+12); t = data[o+16]
            o += 17 + n*type_size[t]
            obj_arrays[oid] = None
        else:
            print(f'[hprof] unknown subrecord 0x{st:02x} at {o-1}', file=sys.stderr)
            sys.exit(1)

print(f'[hprof] classes={len(class_dump)} instances={len(instances)} roots={len(roots)}', file=sys.stderr)

# find Reference classId set (to tag referent edges)
ref_class_ids = {cid for cid, nm in classname.items() if nm in ('java.lang.ref.Reference','java/lang/ref/Reference')}

# layout cache: classId -> list of (fname, type, declClassId)
layout_cache = {}
def layout(cid):
    if cid in layout_cache: return layout_cache[cid]
    out = []
    c = cid
    while c and c in class_dump:
        sup, fields, _ = class_dump[c]
        for fn, t in fields: out.append((fn, t, c))
        c = sup
    layout_cache[cid] = out
    return out

targets = []
inst_class = {}
for oid, cid, off in instances:
    inst_class[oid] = cid
    o2 = off
    for fn, t, decl in layout(cid):
        sz = type_size[t]
        if t == 2:
            v = u8(data, o2)
            if v:
                tag_ = '(referent)' if (decl in ref_class_ids and fn == 'referent') else fn
                edges_rev[v].append((oid, tag_))
        if classname.get(cid,'') == target_class and fn == field_name and t == 10:
            if struct.unpack_from('>i', data, o2)[0] == field_val:
                targets.append(oid)
        o2 += sz

# class objects as parents for statics
for cid, (sup, fields, static_refs) in class_dump.items():
    for v, nm in static_refs:
        edges_rev[v].append((cid, f'static {nm}'))

print(f'[hprof] target instances: {targets}', file=sys.stderr)

def describe(oid):
    if oid in class_dump: return f'class {classname.get(oid,"?")}'
    cid = inst_class.get(oid)
    if cid: return classname.get(cid, '?')
    acid = obj_arrays.get(oid, 0)
    if acid: return classname.get(acid, 'obj[]')
    return 'prim[]/unknown'

allow_referent = '--soft' in sys.argv
for t in targets:
    # BFS child->parent until a root
    seen = {t: None}
    lab = {}
    dq = deque([t])
    found = None
    while dq:
        cur = dq.popleft()
        if cur in roots and cur != t:
            found = cur; break
        for parent, label in edges_rev.get(cur, ()):
            if label == '(referent)' and not allow_referent: continue
            if parent not in seen:
                seen[parent] = cur; lab[parent] = label
                dq.append(parent)
        # class-static parents already in edges_rev
    if not found:
        # maybe the target's holder chain top is itself a root-marked object
        cands = [o for o in seen if o in roots]
        found = cands[0] if cands else None
    if found is None:
        print(f'target {t:x}: NO path to root (without referent edges)')
        continue
    print(f'target {t:x}: root = {roots[found]}')
    chain = []
    cur = found
    while cur is not None:
        chain.append(cur)
        cur = seen[cur]
    print('  chain (root -> target):')
    for i, oid in enumerate(chain):
        via = f'  --.{lab[oid]}-->' if oid in lab else ''
        print(f'    {describe(oid)} @{oid:x}{via}')
