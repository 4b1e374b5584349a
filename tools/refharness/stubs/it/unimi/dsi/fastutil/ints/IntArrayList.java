package it.unimi.dsi.fastutil.ints;

import java.util.Arrays;

/**
 * Minimal shim providing just the fastutil IntArrayList surface the
 * reference solver slice uses, so the solver can be compiled for the
 * differential golden test without the real fastutil jar (offline
 * sandbox). This is an API-compatible stand-in written from scratch —
 * behaviourally a plain growable int array.
 */
public class IntArrayList implements Iterable<Integer> {
    private int[] a;
    private int size;

    public IntArrayList() { this(16); }

    public IntArrayList(int capacity) { a = new int[Math.max(1, capacity)]; }

    public IntArrayList(IntArrayList other) {
        a = Arrays.copyOf(other.a, Math.max(1, other.size));
        size = other.size;
    }

    public boolean add(int v) {
        if (size == a.length) a = Arrays.copyOf(a, a.length * 2);
        a[size++] = v;
        return true;
    }

    public int getInt(int idx) {
        if (idx >= size) throw new IndexOutOfBoundsException(idx + " >= " + size);
        return a[idx];
    }

    public int size() { return size; }

    public boolean isEmpty() { return size == 0; }

    public void clear() { size = 0; }

    public int[] toIntArray() { return Arrays.copyOf(a, size); }

    public int get(int idx) { return getInt(idx); }

    public boolean contains(int v) {
        for (int i = 0; i < size; i++) if (a[i] == v) return true;
        return false;
    }

    public boolean addAll(IntArrayList other) {
        for (int i = 0; i < other.size; i++) add(other.a[i]);
        return other.size > 0;
    }

    @Override
    public java.util.Iterator<Integer> iterator() {
        return new java.util.Iterator<Integer>() {
            private int i;
            @Override public boolean hasNext() { return i < size; }
            @Override public Integer next() { return a[i++]; }
        };
    }
}
